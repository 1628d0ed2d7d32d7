from .csv_sink import CsvSinkOptions, CsvSink  # noqa: F401
