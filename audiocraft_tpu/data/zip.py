"""LRU-cached zipfile access for `PathInZip` manifests.

Parity: `audiocraft/data/zip.py:22-76`.
"""
import typing as tp
import zipfile
from dataclasses import dataclass
from functools import lru_cache

DEFAULT_SIZE = 32
MODE = "r"


@dataclass(order=True)
class PathInZip:
    """Path of a file inside a zip file: `<zip_path>:<file_path>`
    (`zip.py:22-50`)."""
    INFO_PATH_SEP = ":"
    zip_path: str
    file_path: str

    def __init__(self, path: str) -> None:
        split_path = path.split(self.INFO_PATH_SEP)
        assert len(split_path) == 2
        self.zip_path, self.file_path = split_path

    def __str__(self) -> str:
        return self.zip_path + self.INFO_PATH_SEP + self.file_path

    def __hash__(self):
        return hash(str(self))


@lru_cache(DEFAULT_SIZE)
def _open_zip(path: str):
    return zipfile.ZipFile(path, MODE)


def set_zip_cache_size(max_size: int):
    """Resize the zip-file LRU cache (`zip.py:53-60`)."""
    global _open_zip
    _open_zip = lru_cache(max_size)(_open_zip.__wrapped__)  # type: ignore


def open_file_in_zip(path_in_zip: PathInZip, mode: str = "r") -> tp.IO:
    """Open a file inside a (cached) zip file (`zip.py:63-76`)."""
    zf = _open_zip(path_in_zip.zip_path)
    return zf.open(path_in_zip.file_path)
