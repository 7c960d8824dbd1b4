from . import csv_inputs, testdata  # noqa: F401
