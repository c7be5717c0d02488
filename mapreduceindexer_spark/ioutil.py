"""Shared filesystem durability helpers.

One implementation of the fsync discipline used by every module that
publishes state via atomic rename/link (streaming/index_stream.py's
manifest protocol, sources/transact.py's table format): an
``os.replace``/``os.link`` is atomic but not durable until BOTH the
file contents and the containing directory's entry are flushed.
"""

from __future__ import annotations

import os


def fsync_path(path: str) -> None:
    """fsync a file or directory by path. For directories this flushes
    the directory ENTRIES (names) — required after rename/link/create
    for the operation to survive power loss."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def fsync_tree(root: str) -> None:
    """fsync every file and directory under ``root`` (and root itself):
    makes a freshly-written output tree durable before a manifest
    publishes it."""
    for dirpath, _dirnames, filenames in os.walk(root):
        for f in filenames:
            fsync_path(os.path.join(dirpath, f))
        fsync_path(dirpath)
