from .io import TableStore, read_testdata  # noqa: F401
