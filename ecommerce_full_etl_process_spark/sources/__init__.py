from .io import TableStore, read_testdata  # noqa: F401

__all__ = ["TableStore", "read_testdata"]
