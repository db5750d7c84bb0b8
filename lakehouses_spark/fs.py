"""Filesystem utils — the dbutils.fs replacement (SURVEY §7.0).

Same verbs as the reference uses (ls/mkdirs/mv/rm/cp) over pathlib/shutil.
On a real deployment these become object-store client calls; every caller in
the engine goes through this module so that swap is one file.
"""

from __future__ import annotations

import shutil
from pathlib import Path


def ls(path: str | Path) -> list[Path]:
    p = Path(path)
    return sorted(p.iterdir()) if p.is_dir() else []


def mkdirs(path: str | Path) -> Path:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    return p


def mv(src: str | Path, dst: str | Path, create_parents: bool = True) -> None:
    dst = Path(dst)
    if create_parents:
        dst.parent.mkdir(parents=True, exist_ok=True)
    shutil.move(str(src), str(dst))


def cp(src: str | Path, dst: str | Path) -> None:
    dst = Path(dst)
    dst.parent.mkdir(parents=True, exist_ok=True)
    shutil.copy2(str(src), str(dst))


def rm(path: str | Path, recurse: bool = False) -> None:
    p = Path(path)
    if p.is_dir():
        if not recurse:
            raise IsADirectoryError(f"{p} is a directory (use recurse=True)")
        shutil.rmtree(p)
    elif p.exists():
        p.unlink()
