from .conditionals import Conditional, compile_conditionals  # noqa: F401
from .mapping_compiler import ColumnMapping, Mapping, compile_mapping  # noqa: F401
