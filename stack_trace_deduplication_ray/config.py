"""Pipeline configuration.

One dataclass carries every tunable of the dedup pipeline so that the
oracle (tests/oracle.py) and the distributed pipeline are guaranteed to
run at the *same* shingle/signature/band configuration — the parity
requirement of the recall >= 0.99 gate (BASELINE.json `north_rule`).

Reference analog: the argparse/config.json plumbing of
ea/sim/dev/scripts/training/evaluating/eval_fast.py:31-37.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    # --- caption normalization ---------------------------------------
    lowercase: bool = True

    # --- character shingling (reference analog: SeqCoder.ngrams,
    #     ea/sim/main/preprocess/seq_coder.py:68-81) ------------------
    shingle_k: int = 5

    # --- MinHash signature -------------------------------------------
    num_perm: int = 128
    minhash_seed: int = 0x5EED_C0DE

    # --- LSH banding: num_perm = bands * rows_per_band ---------------
    bands: int = 16
    rows_per_band: int = 8

    # Jaccard threshold used by the verify stage (the LSH S-curve
    # threshold for (16, 8) is (1/16)^(1/8) ~= 0.707).
    jaccard_threshold: float = 0.60

    # --- SimHash (image side) ----------------------------------------
    # 64-bit perceptual hash; probing splits it into `simhash_chunks`
    # chunks — two hashes within Hamming distance `hamming_radius`
    # share at least one exact chunk when hamming_radius < chunks
    # (pigeonhole), so chunk-equality groupby is a complete candidate
    # generator for that radius.
    #
    # SCALE NOTE: each chunk is 64/chunks bits wide, so random
    # collisions per chunk bucket grow ~ n / 2^(64/chunks) — at 4
    # chunks (16-bit) the space saturates around 10^6-10^7 rows
    # (measured: ~9k salted hot buckets at 1M rows; the salting
    # machinery absorbs it, but candidate volume grows).
    #
    # simhash_mode picks the key scheme, auto-sized by corpus size:
    #   "chunks" — `simhash_chunks` exact chunk keys (4 keys/row,
    #              16-bit space): cheapest below the saturation knee.
    #   "combo"  — HmSearch-style combination keys over
    #              `simhash_combo_sub` sub-chunks taken
    #              `simhash_combo_r` at a time (20 keys/row at (6,3),
    #              ~2^32 space). Complete for Hamming <= n_sub - r
    #              (= 3). Random birthday PAIR volume grows
    #              quadratically PER COMBINATION (keys from different
    #              combinations cannot collide — the combination index
    #              is folded into the hash): ~C(sub,r) * n^2 /
    #              2^(entropy+1) with entropy = bits covered by r
    #              sub-chunks. At (6, 3) that is 20 * n^2 / 2^33 —
    #              ~19k random pairs at 4M rows (negligible; the 4M
    #              A/B below confirms), ~12M at 1e8, ~1.2e9 at 1e9
    #              (dominant). Above `simhash_combo_widen_rows` auto
    #              widens to (`simhash_combo_wide_sub`,
    #              `simhash_combo_wide_r`) = (8, 5): 56 keys/row but
    #              5x8 = 40 entropy bits per key — 46x fewer random
    #              pairs at any n — still complete for Hamming <= 3.
    #              The threshold sits at 1e8 because the wide tier's
    #              2.8x key multiplicity is a real LINEAR cost paid
    #              immediately (measured at 4M/32 CPUs: (6,3) 493.5 s
    #              vs (8,5) 544-636 s, identical 3,960,250 clusters)
    #              while the collision term it buys down only matters
    #              from ~1e8 rows up.
    #   "auto"   — resolved per run from the corpus row count against
    #              `simhash_wide_threshold_rows` (the measured knee),
    #              then widened past `simhash_combo_widen_rows`.
    # Both schemes generate a SUPERSET of all radius-<=3 pairs and the
    # in-bucket Hamming test filters exactly, so the verified edge set
    # — and the clustering — is identical between modes (tested).
    simhash_mode: str = "auto"
    simhash_chunks: int = 4
    simhash_combo_sub: int = 6
    simhash_combo_r: int = 3
    simhash_wide_threshold_rows: int = 600_000
    # second auto tier: widen the combo scheme where the (6,3)
    # quadratic random-collision term overtakes the wide scheme's
    # linear key-multiplicity cost (~1e8 rows; see the mode comment
    # and BASELINE.md's 4M A/B)
    simhash_combo_wide_sub: int = 8
    simhash_combo_wide_r: int = 5
    simhash_combo_widen_rows: int = 100_000_000
    hamming_radius: int = 3
    psnr_threshold_db: float = 40.0  # per input_hint: PSNR>=40dB for lossy

    # --- repeated-substring pass -------------------------------------
    substring_min_len: int = 32  # L: min shared substring length
    winnow_window: int = 8       # winnowing window (fingerprints kept per L-window)

    # --- skew handling ------------------------------------------------
    # A bucket (LSH band bucket / simhash chunk bucket / fingerprint
    # bucket) with more than `bucket_cap` members is salted: members are
    # split into ceil(n / salt_target) sub-buckets and linked through a
    # per-bucket pivot chain instead of all-pairs (n^2 -> O(n)).
    # Capped buckets are logged, never silently dropped.
    bucket_cap: int = 64
    salt_target: int = 32
    # Hot-bucket detection sampling: rows are hash-sampled at rate
    # 1/hot_sample_mod for the (shuffle-free) bucket-size estimate.
    # 0 = default (16); 1 = exact counts (tests). Raise with corpus
    # size (~rows/1e5) to bound the driver-side merge.
    hot_sample_mod: int = 0

    # --- execution ----------------------------------------------------
    batch_size: int = 2048
    image_batch_size: int = 256   # binary payloads: small batches
    # Shuffle partitions for joins / bucket merges. 0 = resolve at
    # runtime to the cluster CPU count (bounded below at 8); on a
    # multi-node cluster set explicitly to ~1-2x total cores.
    num_partitions: int = 0
    # Coalesce the tagged unions feeding sort-based exchanges down to
    # P blocks (joins.py). At 100k+ rows this is essential: upstream
    # unions carry one block per map task, and the sort schedules
    # per-block work that GROWS with CPU count (measured 650 s vs
    # 110 s at 500k rows / 32 CPUs). At fixture scale the extra
    # all-to-all barrier per exchange dominates instead (measured
    # 15.7 s vs 4.3 s on the 5k-doc pipeline). Pipelines that know
    # their input size call `coalesce_for_rows` to flip this; True is
    # the safe default for the 100-TB target.
    coalesce_exchanges: bool = True
    # Row-count knee for `coalesce_for_rows` (below -> no coalesce).
    coalesce_min_rows: int = 50_000
    # Block-count knee for `coalesce_for_table`: when the exchange
    # inputs are known to carry at least this many blocks, coalesce
    # regardless of row count. Block count — not row count — is what
    # the sort-based groupby actually pays per-block orchestration
    # for (measured at 8k rows / 22 sig blocks: 21 s coalesced vs
    # 26 s gated-off on the image flagship, while the 3-block doc
    # pipeline at 5k rows runs 4-8 s gated-off vs 10-11 s coalesced).
    coalesce_min_blocks: int = 8
    # Actor-pool max size for stateful map stages. 0 = resolve at
    # runtime to (cluster CPUs - 2, min 2).
    actor_concurrency: int = 0
    # Broadcast-join gate (joins.broadcast_attach): a join whose right
    # side is known to be at most this many rows is executed as a
    # driver-built broadcast lookup (`ray.put` once, vectorized
    # searchsorted attach inside map_batches — ZERO exchanges) instead
    # of a partitioned hash join. Above the gate the partitioned join
    # runs unchanged — the at-scale path. Callers with wide payload
    # columns (embeddings, thumbnails) pass a tighter max_rows.
    broadcast_join_max_rows: int = 1_000_000
    # Bytes gate for broadcasting the verify FEATURE table (thumbs +
    # normalized captions + band lists): under it, both pair-side
    # attaches become zero-exchange broadcast lookups and the pair
    # dedup runs as its own NARROW exchange — measured 14.3-17.6 s ->
    # 9.1-9.4 s for the 500k-row verify phase (~310 MB features,
    # identical verified output). Above it (multi-GB corpora) the
    # partitioned two-join shape runs unchanged — the 100-TB path.
    broadcast_feats_max_bytes: int = 800 << 20

    # --- internal id space (string-id corpora) -----------------------
    # String ids are hashed to int64 internal ids (signatures.py
    # IID_SEED note): birthday odds of a silent cluster-merging
    # collision reach ~2.7e-2 at 1e9 rows. exact_string_ids=True
    # removes the ceiling: internal hashes are confined to the
    # non-negative 63-bit half-space, one narrow (iid, orig_id)
    # exchange detects colliding ids exactly, and colliding rows are
    # deterministically remapped into the reserved NEGATIVE id space
    # (disjoint by construction) before any downstream stage runs.
    # Cost: one extra narrow exchange + a map pass — off by default;
    # int64-id corpora pass through and never need it.
    exact_string_ids: bool = False
    # Width of the internal hash id in bits (hash >> (64 - bits)).
    # 64 = the full space (default, bit-identical to prior behavior);
    # exact mode uses at most 63 (sign bit reserved for remapped
    # ids). Small values exist to make collisions testable: at 12
    # bits a few-hundred-row corpus collides by birthday, proving the
    # remap machinery end-to-end (tests/test_exact_ids.py).
    iid_hash_bits: int = 64

    # --- connected components ----------------------------------------
    # Below this many edges the components are solved driver-side with
    # the VECTORIZED numpy union-find (factorize + pointer-jumping
    # min-propagation, no per-edge Python); above it the distributed
    # min-label-propagation loop is used. The gate is a DRIVER-MEMORY
    # bound, not a speed bound: 16M int64 edges stream in at ~256 MB
    # plus ~2x that for codes/labels — ~1 GB driver peak, seconds of
    # work. (The old 2M value was sized for the per-edge-loop UF this
    # replaced; it pushed a 2M-row corpus with ~3M edges onto the
    # distributed path, which cost 39 of the 59 run minutes at
    # 8 CPUs. On a real multi-node cluster edges past this gate are
    # genuinely driver-infeasible and the distributed path is the
    # design; see stages/cc.py.)
    driver_cc_max_edges: int = 16_000_000

    # stages enabled for the flagship run
    stages: tuple[str, ...] = field(
        default=("exact", "minhash", "simhash", "substring")
    )

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"bands*rows_per_band ({self.bands}*{self.rows_per_band}) "
                f"must equal num_perm ({self.num_perm})"
            )
        if self.hamming_radius >= self.simhash_chunks:
            raise ValueError(
                "hamming_radius must be < simhash_chunks for chunk probing "
                "to be a complete candidate generator"
            )
        if self.simhash_mode not in ("auto", "chunks", "combo"):
            raise ValueError(f"unknown simhash_mode {self.simhash_mode!r}")
        if not (8 <= self.iid_hash_bits <= 64):
            raise ValueError(
                f"iid_hash_bits must be in [8, 64], got {self.iid_hash_bits}"
            )
        if self.hamming_radius > self.simhash_combo_sub - self.simhash_combo_r:
            raise ValueError(
                "combination probing is complete only for hamming_radius "
                "<= simhash_combo_sub - simhash_combo_r"
            )
        if self.hamming_radius > (
            self.simhash_combo_wide_sub - self.simhash_combo_wide_r
        ):
            raise ValueError(
                "wide combination probing is complete only for "
                "hamming_radius <= simhash_combo_wide_sub - "
                "simhash_combo_wide_r"
            )


DEFAULT_CONFIG = DedupConfig()


def partitions_for_rows(cfg: DedupConfig, n_rows: int) -> DedupConfig:
    """Row-aware exchange width for SMALL inputs.

    The default width (joins.resolve_partitions: 2 tasks/core, 64 at
    32 CPUs) is right at scale, but every partitioned exchange pays a
    fixed per-partition sort/merge task cost — for a few-thousand-row
    evaluation table that is 64 near-empty tasks per exchange, and the
    rerank/LSH eval queries chain 3-4 exchanges. Below 32k rows the
    width shrinks to ceil(rows / 2000) clamped to [4, 16]; at or above
    32k rows the config is returned unchanged (num_partitions stays 0
    -> the scale default resolves at call time). Derived expansions
    (pair tables, postings) are bounded multiples of the input, so
    per-partition volume stays trivially small. No effect when the
    caller pinned num_partitions explicitly."""
    import dataclasses

    if cfg.num_partitions or n_rows >= 32_000:
        return cfg
    p = max(4, -(-n_rows // 2000))
    return dataclasses.replace(cfg, num_partitions=p)


def coalesce_for_rows(cfg: DedupConfig, n_rows: int) -> DedupConfig:
    """Size-gate the exchange coalesce: below `coalesce_min_rows` the
    extra all-to-all barrier per exchange costs more than the tiny-
    block orchestration it prevents. Callers that know their input
    row count (a materialized table's count() is metadata-cheap, a
    raw parquet read's count() comes from file metadata) thread the
    result through every join/partitioned-groups call."""
    import dataclasses

    want = n_rows >= cfg.coalesce_min_rows
    if cfg.coalesce_exchanges == want:
        return cfg
    return dataclasses.replace(cfg, coalesce_exchanges=want)


def coalesce_for_table(cfg: DedupConfig, n_rows: int, n_blocks: int) -> DedupConfig:
    """Block-count-aware variant of `coalesce_for_rows` for callers
    holding a MATERIALIZED table (num_blocks() is metadata-free).

    The sort-based groupby's fixed cost is per input BLOCK, so a small
    table fanned out over many map tasks (e.g. the image signature
    actor pool) still wants the pre-exchange coalesce, while a small
    few-block table does not — row count alone mis-gates both (see
    coalesce_min_blocks)."""
    import dataclasses

    want = n_rows >= cfg.coalesce_min_rows or n_blocks >= cfg.coalesce_min_blocks
    if cfg.coalesce_exchanges == want:
        return cfg
    return dataclasses.replace(cfg, coalesce_exchanges=want)
