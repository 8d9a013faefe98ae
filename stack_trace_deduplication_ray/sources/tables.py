"""Table readers: column-pruned parquet (lance-gated) sources.

Reference analog: DirectoryStackLoader / per-file JSON parsing
(/root/reference/ea/sim/main/data/stack_loader.py:27-60) — replaced by
columnar block reads with projection pushed into the scan.
"""

from __future__ import annotations

import os


def tune_data_context() -> None:
    """Size Ray Data's read splitting to the cluster, once per driver.

    Ray's default ``read_op_min_num_blocks`` is 200 — a read of any
    size is split into >= 200 blocks, and every downstream
    sort/shuffle then pays a fixed per-block cost (measured: a 750k-row
    join exchange at 264 blocks spends ~6s on sort bookkeeping vs
    ~0.5s on the actual merge). Cap the floor at 2x cluster CPUs:
    enough parallelism for every stage, without flooding small and
    medium jobs with tiny blocks.
    """
    import ray
    from ray.data import DataContext

    ctx = DataContext.get_current()
    cpus = (
        int(ray.cluster_resources().get("CPU", 8))
        if ray.is_initialized()
        else 8
    )
    ctx.read_op_min_num_blocks = max(8, 2 * cpus)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    """Read one testdata table as a Dataset, pruning to `columns`."""
    import ray.data as rd

    tune_data_context()
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
        single = os.path.join(path, "images.parquet")
        if os.path.exists(single):
            path = single
        else:
            # sharded layout (images_*.parquet) from
            # materialize_fixture_sharded / large production inputs
            import glob

            shards = sorted(glob.glob(os.path.join(path, "images*.parquet")))
            if shards:
                return rd.read_parquet(shards, columns=columns)
            # plain directory of parquet parts
    return rd.read_parquet(path, columns=columns)
