from .csv_source import CsvSourceOptions, CsvSource  # noqa: F401
