"""Table readers: column-pruned parquet (lance-gated) sources.

Reference analog: DirectoryStackLoader / per-file JSON parsing
(/root/reference/ea/sim/main/data/stack_loader.py:27-60) — replaced by
columnar block reads with projection pushed into the scan.
"""

from __future__ import annotations

import os


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    """Read one testdata table as a Dataset, pruning to `columns`."""
    import ray.data as rd

    path = os.path.join(sf_dir, f"{name}.parquet")
    return rd.read_parquet(path, columns=columns)


def read_images(path: str, columns: list[str] | None = None):
    """Read an images table. Prefers Lance when the dataset directory
    is Lance-format and the `lance` package is importable; falls back
    to parquet (this container ships no lance wheel)."""
    import ray.data as rd

    if os.path.isdir(path) and os.path.exists(os.path.join(path, "_versions")):
        try:
            import lance  # noqa: F401

            return rd.read_lance(path, columns=columns)
        except ImportError:
            raise NotImplementedError(
                "lance dataset provided but the lance package is not "
                "installed in this environment"
            )
    if os.path.isdir(path):
        path = os.path.join(path, "images.parquet")
    return rd.read_parquet(path, columns=columns)
