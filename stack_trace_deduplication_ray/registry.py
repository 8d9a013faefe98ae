"""Extension surface: named-component registry.

Reference analog: the ``__init_subclass__`` plugin registries
(/root/reference/ea/sim/main/preprocess/entry_coders.py:9-13,
tokenizers/base.py:8-15) and the strategy ABCs the RankingModel
composes (methods/base.py:8-50, retrieval_model.py:9-12). Here the
unit of extension is a NAMED SPEC in a flat registry, because stages
are plain ``Dataset -> Dataset`` functions, not classes:

- kind "expansion": a candidate-generation family for the fused dedup
  pipeline. Spec = (source, build) where source is "caption" | "image"
  (which rep table feeds it) and build(reps_ds, cfg) returns the
  (bucket, image_id[, simhash]) expansion. ``pipelines.dedup``
  resolves cfg.stages through THIS registry, so registering a new
  family makes it runnable by name with skew salting, fused pair
  emission and edge plumbing inherited for free (its pairs verify as
  set-stage candidates unless a verifier is also registered).
- kind "pair_scorer": pairwise caption scorers (lerch / fast / ...).
- kind "metric": evaluation aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

_REGISTRY: dict[tuple[str, str], object] = {}


@dataclass(frozen=True)
class ExpansionSpec:
    source: str  # "caption" | "image"
    build: Callable  # (reps_ds, cfg) -> expansion Dataset


def register(kind: str, name: str, spec) -> None:
    key = (kind, name)
    if key in _REGISTRY and _REGISTRY[key] is not spec:
        raise ValueError(f"{kind}:{name} already registered")
    _REGISTRY[key] = spec


def get(kind: str, name: str):
    try:
        return _REGISTRY[(kind, name)]
    except KeyError:
        raise KeyError(
            f"no {kind} named {name!r}; known: {names(kind)}"
        ) from None


def names(kind: str) -> list[str]:
    return sorted(n for k, n in _REGISTRY if k == kind)


def _register_builtins() -> None:
    from stack_trace_deduplication_ray.functions import scoring as S
    from stack_trace_deduplication_ray.stages import expand as ex

    register(
        "expansion", "minhash",
        ExpansionSpec("caption", lambda reps, cfg: ex.expand_minhash(reps, cfg)),
    )
    register(
        "expansion", "simhash",
        ExpansionSpec("image", lambda reps, cfg: ex.expand_simhash(reps, cfg)),
    )
    register(
        "expansion", "substring",
        ExpansionSpec("caption", lambda reps, cfg: ex.expand_substring(reps, cfg)),
    )
    register("pair_scorer", "lerch", S.lerch_score)
    register("pair_scorer", "fast", S.fast_align)

    from stack_trace_deduplication_ray.eval import metrics as M

    register("metric", "f_beta_sweep", M.f_beta_sweep)
    register("metric", "roc_auc", M.roc_auc)
    register("metric", "bootstrap_ci", M.bootstrap_ci)


_register_builtins()
