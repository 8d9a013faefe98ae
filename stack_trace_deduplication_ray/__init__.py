"""Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch re-expression of the capabilities of
JetBrains-Research/stack-trace-deduplication (reference at
/root/reference — studied for WHAT it computes, not how) as idiomatic
``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- exact dedup (reference: ``Stack.__hash__`` keep-first,
  ea/sim/main/data/objects/issue.py:13-22)
- MinHash + LSH banding over character-shingled captions (replaces the
  reference's exhaustive pairwise rankers, ea/sim/main/methods/classic/fast.py)
- 64-bit SimHash with Hamming chunk probing for image near-dups
- winnowing / suffix-array repeated-substring pass for caption substrings
- candidate verify (exact Jaccard / Hamming / PSNR) and union-find
  connected components (reference: transitive issue merging,
  ea/sim/dev/scripts/data/preprocess/so/steps/merge_issues_duplicates.py)

All stages are ``map_batches`` transforms (actor pools where state is
needed); wide steps are explicit groupby/sort shuffles with salting for
skewed LSH buckets.
"""

from stack_trace_deduplication_ray.config import DedupConfig


def _shield_ray_fsspec_probe() -> None:
    """Environment workaround: Ray's parquet path resolution probes
    ``fsspec.implementations.http.HTTPFileSystem`` and only catches
    ModuleNotFoundError, but in this container (fsspec without aiohttp)
    the probe can raise a plain ImportError from a partially-imported
    module, killing every local read_parquet. Wrap the probe so an
    ImportError means "not an HTTP filesystem"."""
    try:
        from ray.data.datasource import path_util
    except Exception:
        return
    orig = path_util._is_http_filesystem

    def safe(fs):
        try:
            return orig(fs)
        except ImportError:
            return False

    if getattr(orig, "__name__", "") != "safe":
        path_util._is_http_filesystem = safe


_shield_ray_fsspec_probe()

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
