"""URI-dispatching filesystem helpers for the engine's METADATA I/O.

Spark itself moves the data: scans and writes go through Hadoop
connectors, so ``s3a://`` / ``gs://`` / ``hdfs://`` table paths work
there out of the box.  What the ENGINE does besides Spark jobs is
metadata-sized file work — parquet footer reads for stats, listing a
just-written insert directory, file sizes, GC deletes — and doing that
through ``os.*`` would pin the catalog to a local disk.  These helpers
route scheme-less paths to the local filesystem (zero-overhead fast
path) and URIs through ``pyarrow.fs.FileSystem.from_uri`` (S3/GCS/HDFS
support ships inside pyarrow), returning paths WITH their original
scheme prefix so catalog rows stay directly usable by Spark readers.
"""

from __future__ import annotations

import os
import re
import shutil

import pyarrow.parquet as pq
from pyarrow import fs as pafs

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://")


def has_scheme(path: str) -> bool:
    return bool(_SCHEME_RE.match(path))


def resolve(path: str):
    """(filesystem, fs-local path, prefix) — prefix restores the
    original scheme on child paths the filesystem returns."""
    if not has_scheme(path):
        return pafs.LocalFileSystem(), path, ""
    fs, rel = pafs.FileSystem.from_uri(path)
    prefix = path[: len(path) - len(rel)] if path.endswith(rel) else ""
    return fs, rel, prefix


def absolutize(path: str) -> str:
    """abspath for local paths; URIs pass through untouched."""
    return path if has_scheme(path) else os.path.abspath(path)


def makedirs(path: str) -> None:
    if not has_scheme(path):
        os.makedirs(path, exist_ok=True)
        return
    fs, rel, _ = resolve(path)
    fs.create_dir(rel, recursive=True)


def isdir(path: str) -> bool:
    if not has_scheme(path):
        return os.path.isdir(path)
    fs, rel, _ = resolve(path)
    return fs.get_file_info(rel).type == pafs.FileType.Directory


def getsize(path: str) -> int:
    if not has_scheme(path):
        return os.path.getsize(path)
    fs, rel, _ = resolve(path)
    return int(fs.get_file_info(rel).size or 0)


def remove(path: str) -> None:
    if not has_scheme(path):
        os.remove(path)
        return
    fs, rel, _ = resolve(path)
    fs.delete_file(rel)


def move(src: str, dst: str) -> None:
    """Rename/move a single file (same filesystem)."""
    if not has_scheme(src) and not has_scheme(dst):
        os.replace(src, dst)
        return
    fs, rel_src, _ = resolve(src)
    _, rel_dst, _ = resolve(dst)
    fs.move(rel_src, rel_dst)


def rmtree(path: str, ignore_errors: bool = True) -> None:
    if not has_scheme(path):
        shutil.rmtree(path, ignore_errors=ignore_errors)
        return
    fs, rel, _ = resolve(path)
    try:
        fs.delete_dir(rel)
    except (FileNotFoundError, OSError):
        if not ignore_errors:
            raise


def list_files(path: str, recursive: bool = False) -> list[tuple[str, int]]:
    """[(full path incl. original scheme, size)] of plain files under
    ``path`` (empty when the directory is missing)."""
    fs, rel, prefix = resolve(path)
    try:
        infos = fs.get_file_info(
            pafs.FileSelector(rel, recursive=recursive)
        )
    except (FileNotFoundError, OSError):
        return []
    return sorted(
        (prefix + i.path, int(i.size or 0))
        for i in infos
        if i.type == pafs.FileType.File
    )


def parquet_metadata(path: str):
    if not has_scheme(path):
        return pq.ParquetFile(path).metadata
    fs, rel, _ = resolve(path)
    with fs.open_input_file(rel) as f:
        return pq.ParquetFile(f).metadata


def read_schema(path: str):
    if not has_scheme(path):
        return pq.read_schema(path)
    fs, rel, _ = resolve(path)
    return pq.read_schema(rel, filesystem=fs)


def write_text(path: str, text: str) -> None:
    if not has_scheme(path):
        with open(path, "w") as f:
            f.write(text)
        return
    fs, rel, _ = resolve(path)
    with fs.open_output_stream(rel) as f:
        f.write(text.encode())


def read_text(path: str) -> str:
    if not has_scheme(path):
        with open(path) as f:
            return f.read()
    fs, rel, _ = resolve(path)
    with fs.open_input_stream(rel) as f:
        return f.read().decode()
