"""Conversation-level analytics over multi-turn transcript tables.

The engine's linkage layer treats each TURN as a record; this module
treats each CONVERSATION as the unit — the granularity a training-data
pipeline dedups and profiles multi-turn chat/agent transcripts at
(BASELINE.json input_hint: (conv_id, turn_idx, role, text, tool, ts)).

The operator surface:

* :func:`conversation_docs` — fold a turns table into one row per
  conversation carrying the turn-ordered action/token sequence.  ONE
  shuffle (groupBy conv); order is recovered DETERMINISTICALLY by
  ``array_sort`` over (order keys, token) structs, so the result is
  identical at every parallelism level — ``collect_list`` alone is
  partition-order-dependent and would break the value-hash oracle.
  Per-group state is bounded by the longest conversation (turns per
  conversation is a bounded quantity — tens to low thousands — unlike
  rows per key in general), so the fold is safe at 10^12 total turns.

* :func:`action_transitions` — the action-bigram transition profile
  (prev_action, action, n): one window per conversation + one
  map-side-combinable groupBy whose result is |alphabet|² rows at most.
  This is the "what do agents actually do" report for tool-call
  transcripts.

* :func:`jaccard_set_join` / :func:`conversation_near_dups` — an EXACT
  threshold Jaccard self-join via prefix filtering (the AllPairs/PPJoin
  probing prefix: Bayardo et al. WWW'07, Xiao et al. WWW'08).  Unlike
  MinHash LSH (dedup.py — probabilistic recall, tuned for high-τ
  near-dups), this join is recall-LOSSLESS at any τ: two sets with
  J ≥ τ must share at least one element of their (global-rarity-ordered)
  prefixes of length |X| − ceil(τ·|X|) + 1.  Conversations built from a
  small action alphabet sit in exactly the moderate-τ regime where LSH
  banding recall decays, so the exact join is the right tool.

* :func:`conversation_signatures` — injection-free exact-dedup identity
  (xxhash64 of the ordered token ARRAY); :func:`conversation_stats` /
  :func:`conversation_quality` — the structural curation gate
  (turn count, action diversity, longest identical-action run via one
  codegen ``aggregate`` sweep — no window); and
  :func:`with_conversation_split` — leakage-safe train/valid/test as a
  pure function of the conversation id.

Scale design:

* The threshold rides as an INTEGER ratio (tau_num / tau_den) and the
  verify compares ``tau_den · |A∩B| ≥ tau_num · |A∪B|`` in 64-bit
  integer arithmetic — no float boundary exists anywhere, so a DuckDB
  oracle reproduces the decision bit-for-bit (same rule as
  token_join.py's integer idf weights).
* Candidate generation carries (id, shingle-hash, set-size) ONLY; the
  shingle arrays join back after the candidate distinct (rule 7 — the
  id-only shuffle discipline, plan-asserted in tests/test_plans.py).
* Prefix tokens are the globally RAREST elements of each set (ordered
  by corpus document frequency, hash tiebreak), so a stop-shingle never
  enters a prefix unless a set has nothing rarer — candidate volume
  tracks the true output size, not the token-frequency skew.  Residual
  hot prefix tokens are AQE skew-join territory.
* Both length filters (τ·|A| ≤ |B| and τ·|B| ≤ |A|) prune map-side
  before the candidate join, again in integer arithmetic.

Recall proof obligation: tests/test_conversations.py compares the
prefix-filtered join against brute-force all-pairs on both synthetic
planted near-dups and the sf0.001 events distribution — exact equality,
not a recall floor (same adjudication as the Ed-Join oracle,
edjoin.py).
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ordered_token_arrays(
    turns: DataFrame,
    conv_col: str,
    order_cols: Sequence[str],
    token_col: str,
) -> DataFrame:
    """(conv, n_turns, n_total_turns, toks array<string>) — the
    turn-ordered token sequence per conversation, recovered
    deterministically (array_sort over order-key structs) in ONE shuffle.
    NULL tokens are dropped from the fold (they carry no sequence
    information), so ``n_turns`` counts NON-NULL-token turns;
    ``n_total_turns`` counts every turn, letting consumers distinguish a
    partial-NULL conversation from a genuinely short one (round-3
    ADVICE).  Conversations with NO non-NULL token at all are absent from
    the output entirely (callers that must surface them handle it
    explicitly — jobs/curate_transcripts.py's ``no_actions`` reject).
    Order keys must be unique per conversation for the result to be
    well-defined — true for (ts, event_id) and for (conv_id, turn_idx)
    per the input_hint's stable-ordering invariant."""
    keyed = turns.select(
        F.col(conv_col).alias("conv"),
        # NULL-token turns contribute a NULL struct, which collect_list
        # skips — one aggregation yields both counts and the fold.
        F.when(
            F.col(token_col).isNotNull(),
            F.struct(
                *[F.col(c).alias(f"k{i}") for i, c in enumerate(order_cols)],
                F.col(token_col).alias("tok"),
            ),
        ).alias("kt"),
    )
    folded = keyed.groupBy("conv").agg(
        F.array_sort(F.collect_list("kt")).alias("kts"),
        F.count("kt").alias("n_turns"),
        F.count(F.lit(1)).alias("n_total_turns"),
    )
    # kts is a real projected column (HOF rule 1): the transform lambda
    # references the aggregation output, never an inline expression.
    return folded.where(F.col("n_turns") > 0).select(
        "conv",
        "n_turns",
        "n_total_turns",
        F.transform("kts", lambda s: s["tok"]).alias("toks"),
    )


def conversation_docs(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    token_col: str = "action",
    out_seq: str = "seq",
) -> DataFrame:
    """One row per conversation: (conv, n_turns, seq) where ``seq`` is the
    space-joined token sequence in (order_cols) order (see
    :func:`_ordered_token_arrays` for the determinism argument).

    ``seq`` is a whitespace-joined RENDERING: consumers that re-split it
    (shingling) work at word granularity, so multi-word tokens dissolve
    into their words.  That is the intended semantics for text payloads;
    identity-sensitive consumers (exact dedup) must hash the token ARRAY
    instead — :func:`conversation_signatures` — because the rendering
    conflates ['a b','c'] with ['a','b c']."""
    folded = _ordered_token_arrays(turns, conv_col, order_cols, token_col)
    return folded.select(
        F.col("conv").alias(conv_col),
        "n_turns",
        F.concat_ws(" ", "toks").alias(out_seq),
    )


def conversation_signatures(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    token_col: str = "action",
) -> DataFrame:
    """(conv, n_turns, sig) — a 64-bit content signature of the ORDERED
    token array, for exact conversation dedup.  ``xxhash64`` hashes the
    array structurally (length + elements), so there is no separator to
    inject: ['a b', 'c'] and ['a', 'b c'] get different signatures, which
    the whitespace-joined ``seq`` rendering cannot guarantee."""
    folded = _ordered_token_arrays(turns, conv_col, order_cols, token_col)
    return folded.select(
        F.col("conv").alias(conv_col),
        "n_turns",
        F.xxhash64("n_turns", "toks").alias("sig"),
    )


def conversation_stats(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    token_col: str = "action",
) -> DataFrame:
    """Per-conversation structural profile: (conv, n_turns,
    n_total_turns, n_distinct_actions, max_run) where ``max_run`` is the
    longest run of CONSECUTIVE identical actions — the "agent stuck in a
    loop" signal.  ``n_turns`` counts non-NULL-token turns (the sequence
    statistics' domain); ``n_total_turns`` counts every turn, so a
    partial-NULL conversation is distinguishable from a short one.

    The run statistic is gaps-and-islands, computed WITHOUT a second
    shuffle: the fold already produced the ordered token array, so the
    max run is one ``aggregate`` HOF sweep (struct accumulator
    (prev, run, best)) inside whole-stage codegen — zero Python, zero
    window.  Total cost: the one groupBy(conv) shuffle every
    conversation-level operator pays.
    """
    folded = _ordered_token_arrays(turns, conv_col, order_cols, token_col)
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, t):
        run = (
            F.when(t.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
        )
        return F.struct(
            t.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return folded.select(
        F.col("conv").alias(conv_col),
        "n_turns",
        "n_total_turns",
        F.size(F.array_distinct("toks")).alias("n_distinct_actions"),
        F.aggregate("toks", acc0, step)["best"].alias("max_run"),
    )


def conversation_quality(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    token_col: str = "action",
    min_turns: int = 3,
    min_distinct: int = 2,
    max_run: int = 4,
) -> DataFrame:
    """Conversation-level keep/drop curation gate with per-rule reasons —
    the transcript-corpus sibling of corpus.py's document quality_filter.

    Rules (all exact integer comparisons, so an oracle replays the
    decision bit-for-bit).  They run on ``n_turns`` = NON-NULL-token
    turns — the domain the sequence statistics are defined on; the output
    carries ``n_total_turns`` alongside so callers can see when a
    conversation was short on ACTIONS rather than short outright:
      * ``too_short``      — n_turns < min_turns
      * ``low_diversity``  — n_distinct_actions < min_distinct
      * ``stuck_loop``     — the longest identical-action run reaches the
        ``max_run`` threshold (degenerate tool-call repetition, the
        classic agent-transcript failure mode)

    Same errors-as-data idiom as quality_filter: reasons is the
    comma-joined rule list, keep = (reasons == '').
    """
    stats = conversation_stats(turns, conv_col, order_cols, token_col)
    flags = F.array(
        F.when(F.col("n_turns") < min_turns, F.lit("too_short")),
        F.when(
            F.col("n_distinct_actions") < min_distinct, F.lit("low_diversity")
        ),
        F.when(F.col("max_run") >= max_run, F.lit("stuck_loop")),
    )
    reasons = F.array_join(F.filter(flags, lambda x: x.isNotNull()), ",")
    return stats.withColumn("reasons", reasons).withColumn(
        "keep", F.col("reasons") == ""
    )


def with_conversation_split(
    turns: DataFrame,
    conv_col: str = "conv_id",
    train_pct: int = 80,
    valid_pct: int = 10,
    method: str = "xxhash",
    salt: int = 2024,
) -> DataFrame:
    """Leakage-safe train/valid/test assignment for transcript corpora:
    the split is a pure function of the CONVERSATION id (corpus.py's
    split_assign), so every turn of a conversation lands in the same
    split by construction — no join, no shuffle, no coordination, and no
    cross-split leakage of multi-turn context.  Splitting transcript data
    at turn granularity is the classic eval-contamination bug; keying the
    hash on conv_col makes it structurally impossible."""
    from postal_address_spark.operators.corpus import split_assign

    bucket = split_assign(F.col(conv_col), 100, method=method, salt=salt)
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return turns.withColumn("split", split)


def action_transitions(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    token_col: str = "action",
) -> DataFrame:
    """Action-bigram counts across all conversations:
    (prev_action, action, n_transitions), first turn of each conversation
    excluded (no predecessor).

    One shuffle to order within conversations (window) + one tiny
    map-side-combinable groupBy — the output is at most |alphabet|² rows
    regardless of corpus size.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(*[F.col(c) for c in order_cols])
    lagged = (
        turns.where(F.col(token_col).isNotNull())
        .withColumn("prev_action", F.lag(token_col).over(w))
        .where(F.col("prev_action").isNotNull())
    )
    return lagged.groupBy(
        "prev_action", F.col(token_col).alias("action")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))


def jaccard_set_join(
    sets: DataFrame,
    id_col: str,
    set_col: str,
    tau_num: int,
    tau_den: int,
    persist: bool = True,
) -> DataFrame:
    """Exact Jaccard-threshold self-join over (id, array<long> set) rows.

    Returns (id_a, id_b, n_inter, n_union) for every unordered pair with
    |A∩B| / |A∪B| ≥ tau_num / tau_den — recall-lossless via the PPJoin
    probing prefix (module docstring).  The set column must hold DISTINCT
    elements (``with_shingle_hashes`` output qualifies) and be non-empty.

    CACHING CONTRACT: with ``persist=True`` (default) the projected
    (id, set, size) base is persisted MEMORY_AND_DISK and — because the
    returned DataFrame is lazy — can only be released by the CALLER
    (``spark.catalog.clearCache()``, or materialize-then-clear as
    jobs/curate_transcripts.py does after its writes).  Long-lived
    sessions (notebooks, iterative curation loops) that call this
    repeatedly must do so or accumulate cached partitions.  Pass
    ``persist=False`` to opt out; the upstream set construction (fold +
    shingling) then recomputes once per consumer (4x) — acceptable when
    the input is itself already cached or cheap.
    """
    if not (0 < tau_num <= tau_den):
        raise ValueError("threshold must satisfy 0 < tau_num/tau_den <= 1")

    from pyspark import StorageLevel

    # (id, set, size) feeds four consumers (df aggregate, rarity re-sort,
    # and both verify sides) whose shuffles differ — without the cache the
    # upstream set construction (conversation fold + shingling) would run
    # four times.  Same discipline as token_join.py's token cache; the
    # cache lives until clearCache()/unpersist (see docstring contract).
    base = sets.select(
        F.col(id_col).alias("sid"),
        F.col(set_col).alias("sh"),
        F.size(set_col).cast("long").alias("sz"),
    )
    if persist:
        base = base.persist(StorageLevel.MEMORY_AND_DISK)
    # set arrays are never empty (shingle fallback hashes the whole text),
    # and explode_outer avoids the inferred size>0 filter that re-inlines
    # the array expression (engine rule 2).
    exploded = base.select("sid", F.explode_outer("sh").alias("h"))
    dfc = exploded.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    # Rebuild each set SORTED by global rarity (df asc, hash tiebreak):
    # the global total order every prefix-filter proof requires.
    ranked = (
        exploded.join(dfc, "h")
        .groupBy("sid")
        .agg(F.array_sort(F.collect_list(F.struct("df", "h"))).alias("ranked"))
        .select(
            "sid",
            F.transform("ranked", lambda s: s["h"]).alias("sh_sorted"),
        )
    )
    # probing prefix: |X| - ceil(tau * |X|) + 1 elements, integer ceil
    prefixed = ranked.join(base.select("sid", "sz"), "sid").select(
        "sid",
        "sz",
        F.expr(
            "slice(sh_sorted, 1, "
            f"CAST(size(sh_sorted) - ((size(sh_sorted) * {tau_num} + {tau_den - 1}) "
            f"DIV {tau_den}) + 1 AS INT))"
        ).alias("prefix"),
    )
    probe = prefixed.select(
        "sid", "sz", F.explode_outer("prefix").alias("h")
    )
    a = probe.select(
        F.col("sid").alias("id_a"), F.col("sz").alias("sz_a"), "h"
    )
    b = probe.select(
        F.col("sid").alias("id_b"), F.col("sz").alias("sz_b"), "h"
    )
    # candidates: shared prefix token + both integer length filters;
    # (id, h, sz) only — no arrays ride this shuffle (rule 7)
    cands = (
        a.join(b, "h")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("sz_a") * tau_num <= F.col("sz_b") * tau_den)
            & (F.col("sz_b") * tau_num <= F.col("sz_a") * tau_den)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # verify: arrays join back AFTER the candidate dedup
    sa = base.select(F.col("sid").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = base.select(F.col("sid").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "n_inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
        )
        .withColumn(
            "n_union",
            F.size("sh_a").cast("long")
            + F.size("sh_b").cast("long")
            - F.col("n_inter"),
        )
        # integer cross-multiply: no float threshold boundary anywhere
        .where(F.col("n_inter") * tau_den >= F.col("n_union") * tau_num)
        .select("id_a", "id_b", "n_inter", "n_union")
    )
    return verified


def conversation_near_dups(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    token_col: str = "action",
    shingle_n: int = 3,
    tau_num: int = 42,
    tau_den: int = 100,
) -> DataFrame:
    """Conversation pairs whose action-sequence shingle sets overlap with
    Jaccard ≥ tau_num/tau_den — exact recall (no LSH), integer decision.

    Composition: conversation_docs → with_shingle_hashes (order-sensitive
    n-grams of the action sequence, dedup.py's hashed-shingle path) →
    jaccard_set_join.  Returns (conv_a, conv_b, n_inter, n_union).
    """
    from postal_address_spark.operators.dedup import with_shingle_hashes

    docs = conversation_docs(turns, conv_col, order_cols, token_col)
    shingled = with_shingle_hashes(docs, "seq", shingle_n, out_col="shingles")
    pairs = jaccard_set_join(shingled, conv_col, "shingles", tau_num, tau_den)
    return pairs.select(
        F.col("id_a").alias("conv_a"),
        F.col("id_b").alias("conv_b"),
        "n_inter",
        "n_union",
    )


def conversation_windows(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    token_col: str = "action",
    window: int = 8,
    stride: int = 4,
) -> DataFrame:
    """Overlapping fixed-size CONTEXT WINDOWS over each conversation's
    ordered turn sequence — the pretraining chunking for transcripts too
    long for one context (``udtf_doc_chunks`` for documents; this is the
    conversation-aware form): consecutive windows overlap by
    ``window - stride`` turns so no cross-boundary context is lost.

    Output: ``(conv, window_idx, start_turn, n_window_turns,
    window_text)``.  Window starts are ``0, stride, 2*stride, ...`` with
    ``n_windows = 1 + ceil(max(0, n - window) / stride)`` — every turn is
    covered whenever ``stride <= window`` (the usual overlap regime;
    larger strides subsample deliberately), only the LAST window may be
    short (the slice truncates at the sequence end), and a conversation
    shorter than ``window`` yields exactly one window.  All boundary arithmetic is integer (the ceil is
    ``(extra + stride - 1) // stride``), so a DuckDB oracle replays every
    window bit-for-bit.

    Cost shape: ONE fold shuffle (the shared ordered-array fold) + one
    generator — no second shuffle, no join.  The token array and the
    window count are real projected columns before the generator (HOF
    rule 1), and the never-empty window-index sequence uses
    ``posexplode_outer`` (rule 2: plain explode would add an inferred
    size>0 filter that re-inlines the sequence expression).
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    docs = _ordered_token_arrays(turns, conv_col, order_cols, token_col)
    extra = F.greatest(F.lit(0), F.col("n_turns") - F.lit(window))
    n_win = (
        F.lit(1)
        + F.floor((extra + F.lit(stride - 1)) / F.lit(stride)).cast("long")
    ).cast("int")
    sized = docs.select(
        "conv", "toks", n_win.alias("_n_win")
    )
    exploded = sized.select(
        "conv",
        "toks",
        F.posexplode_outer(F.sequence(F.lit(0), F.col("_n_win") - 1)).alias(
            "window_idx", "_i"
        ),
    )
    piece = F.slice("toks", F.col("_i") * stride + 1, window)
    return exploded.select(
        "conv",
        F.col("window_idx").cast("int").alias("window_idx"),
        (F.col("_i") * stride).cast("int").alias("start_turn"),
        F.size(piece).cast("int").alias("n_window_turns"),
        F.concat_ws(" ", piece).alias("window_text"),
    )


def alternation_stats(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    role_col: str = "role",
) -> DataFrame:
    """Role-alternation well-formedness per conversation — the SFT-corpus
    sanity check (chat fine-tuning expects user/assistant turns to
    alternate; repeated-role runs usually mean merged or dropped turns):
    ``(conv, n_turns, n_same_adjacent, first_violation_idx)`` where
    ``n_same_adjacent`` counts adjacent turn pairs with the SAME role and
    ``first_violation_idx`` is the 0-based ordinal of the first offender
    (NULL when well-formed).  NULL-role turns are excluded (the fold
    rule); all outputs integer, oracle-replayable.

    One window (lag over the turn order) + one aggregation on the same
    key — the Exchange is reused, no join.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(*order_cols)
    marked = (
        turns.where(F.col(role_col).isNotNull())
        .select(
            F.col(conv_col).alias("conv"),
            *[F.col(c) for c in order_cols],
            F.col(role_col).alias("_r"),
        )
        .withColumn(
            "_same",
            (
                F.lag("_r").over(
                    Window.partitionBy("conv").orderBy(*order_cols)
                )
                == F.col("_r")
            ).cast("int"),
        )
        .withColumn(
            "_ord",
            F.row_number().over(
                Window.partitionBy("conv").orderBy(*order_cols)
            )
            - 1,
        )
    )
    return marked.groupBy("conv").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.coalesce(F.sum("_same"), F.lit(0)).cast("long").alias(
            "n_same_adjacent"
        ),
        F.min(F.when(F.col("_same") == 1, F.col("_ord"))).cast("int").alias(
            "first_violation_idx"
        ),
    )


def prefix_containment_dups(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    token_col: str = "action",
) -> DataFrame:
    """Prefix-containment dedup decisions — the incremental-logging trap
    neither exact dedup nor Jaccard reliably catches: a chat pipeline
    that snapshots the log after every exchange stores k PREFIXES of the
    final conversation.  Exact signatures differ (different lengths);
    token-SET Jaccard can sit below any threshold once later turns add
    vocabulary; yet training on all k copies over-weights the opening
    turns k-fold.  A conversation is a prefix-duplicate iff its FULL
    ordered token sequence equals the first ``n`` tokens of a STRICTLY
    longer conversation (infix/suffix containment intentionally excluded:
    a shared opening is containment; a shared middle is coincidence).
    Equal-length exact duplicates are :func:`conversation_signatures`'
    job and are deliberately NOT flagged here.

    Scale shape (the engine rules): candidate generation is an equi-join
    on integer signatures only — the prefix stream carries ``(conv, k,
    checksum, last_tok_hash)`` longs, one row per turn (O(total turns),
    token text never rides the stream); the full-side signature is one
    row per conversation computed from the already-folded array.  Token
    arrays join back ONLY for the exact ``slice == toks`` verification of
    the (bounded) candidate set — dedup rule 7's "ids explode, payloads
    join back".  The checksum is an order-insensitive positional sum
    (``sum(pmod(xxhash64(tok), 2^31))``), so anagram prefixes can
    collide into candidates; the verify join rejects them, keeping the
    operator EXACT (tests plant such collisions).  Transitivity is free:
    prefix-of-a-prefix is a prefix, so keep/drop needs no closure.

    Output, one row per conversation with ≥1 non-NULL token:
    ``(conv_col, n_turns, status kept|prefix_dup, n_containers,
    container, container_n_turns)`` — ``container`` is the LONGEST
    containing conversation (ties: smallest id; the argmax is a
    ``min(struct(-n, id))``, bit-stable across engines)."""
    mod = F.lit(1 << 31)
    folded = _ordered_token_arrays(turns, conv_col, order_cols, token_col)
    base = folded.select("conv", "n_turns", "toks")

    pos = base.select(
        "conv", F.posexplode_outer("toks").alias("i", "tok")
    )
    pos = pos.select(
        "conv",
        (F.col("i") + 1).alias("k"),
        F.pmod(F.xxhash64("tok"), mod).alias("tokh"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("conv")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pref = pos.select(
        "conv", "k", F.sum("tokh").over(w).alias("cum"), "tokh"
    )

    full = base.select(
        "conv",
        "n_turns",
        F.aggregate(
            "toks",
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.pmod(F.xxhash64(x), mod),
        ).alias("cum"),
        F.pmod(F.xxhash64(F.element_at("toks", -1)), mod).alias("tokh"),
    )

    cand = (
        full.alias("c")
        .join(
            pref.alias("d"),
            (F.col("c.n_turns") == F.col("d.k"))
            & (F.col("c.cum") == F.col("d.cum"))
            & (F.col("c.tokh") == F.col("d.tokh"))
            & (F.col("c.conv") != F.col("d.conv")),
        )
        .select(
            F.col("c.conv").alias("contained"),
            F.col("d.conv").alias("container"),
            F.col("c.n_turns").alias("k"),
        )
    )

    ver = (
        cand.join(
            base.select(
                F.col("conv").alias("contained"),
                F.col("toks").alias("toks_c"),
            ),
            "contained",
        )
        .join(
            base.select(
                F.col("conv").alias("container"),
                F.col("n_turns").alias("n_d"),
                F.col("toks").alias("toks_d"),
            ),
            "container",
        )
        .where(
            (F.col("n_d") > F.col("k"))
            & (F.slice("toks_d", F.lit(1), F.col("k")) == F.col("toks_c"))
        )
    )

    per = ver.groupBy("contained").agg(
        F.count(F.lit(1)).alias("n_containers"),
        F.min(
            F.struct(
                (-F.col("n_d")).alias("neg"),
                F.col("container").alias("c"),
            )
        ).alias("rep"),
    )

    return (
        base.select("conv", "n_turns")
        .join(per, F.col("conv") == F.col("contained"), "left")
        .select(
            F.col("conv").alias(conv_col),
            "n_turns",
            F.when(
                F.col("n_containers").isNotNull(), F.lit("prefix_dup")
            )
            .otherwise(F.lit("kept"))
            .alias("status"),
            F.coalesce("n_containers", F.lit(0))
            .cast("long")
            .alias("n_containers"),
            F.col("rep.c").alias("container"),
            (-F.col("rep.neg")).cast("long").alias("container_n_turns"),
        )
    )


def boilerplate_turns(
    turns: DataFrame,
    conv_col: str = "conv_id",
    token_col: str = "action",
) -> DataFrame:
    """Cross-conversation repeated-turn profile — the transcript-corpus
    analogue of document boilerplate: system prompts, canned greetings
    and templated tool banners repeat VERBATIM across conversations, so
    they dominate any content-based dedup identity (two conversations
    sharing only their system prompt can clear a Jaccard threshold on
    boilerplate alone — the text cousin of the role-sequence trap this
    job's dedup identity already documents).

    One row per distinct non-NULL token value: ``(token, n_convs,
    n_turns, share_convs)`` where ``share_convs`` is the single
    int/int division ``n_convs / total conversations`` (NULL when the
    corpus is empty).  Callers threshold ``n_convs`` themselves — what
    counts as boilerplate is a corpus-size decision, not an operator
    constant.

    Scale shape: conv-distinctness WITHOUT a countDistinct Expand — one
    map-side-combinable ``groupBy(token, conv)`` collapse, then one
    vocabulary-scale ``groupBy(token)`` roll-up; the corpus-wide
    conversation total is a 1-row aggregate broadcast by the cross
    join (evaluate.py precedent).  Output is vocabulary-sized."""
    base = turns.select(
        F.col(conv_col).alias("conv"), F.col(token_col).alias("token")
    ).where(F.col("token").isNotNull() & F.col("conv").isNotNull())
    per_conv = base.groupBy("token", "conv").agg(
        F.count(F.lit(1)).alias("_n")
    )
    prof = per_conv.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_convs"),
        F.sum("_n").alias("n_turns"),
    )
    total = (
        turns.where(F.col(conv_col).isNotNull())
        .select(F.col(conv_col).alias("conv"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("_total"))
    )
    return prof.crossJoin(F.broadcast(total)).select(
        "token",
        F.col("n_convs").cast("long").alias("n_convs"),
        F.col("n_turns").cast("long").alias("n_turns"),
        (F.col("n_convs") / F.nullif(F.col("_total"), F.lit(0))).alias(
            "share_convs"
        ),
    )


def mask_boilerplate_identity(
    turns: DataFrame,
    boiler_tokens: DataFrame,
    conv_col: str = "conv_id",
    token_col: str = "_dedup_tok",
) -> DataFrame:
    """NULL the boilerplate values out of a dedup-identity column so
    downstream folds (exact signature, near-dup shingles — both drop
    NULL tokens) compare conversations by their CONTENT, not their
    shared templates.  ``boiler_tokens``: a frame with a ``token``
    column (typically :func:`boilerplate_turns` thresholded on
    ``n_convs``) — vocabulary-scale by construction, broadcast into a
    left join, never shuffled against the turns.

    THE FALLBACK THAT KEEPS THIS SAFE: a conversation consisting
    ENTIRELY of boilerplate would lose every identity token and vanish
    from the dedup folds — silently surviving every dedup stage (or
    worse, being dropped by a keep-one semi-join it never entered).
    Such conversations keep their RAW tokens instead (one conv-level
    aggregate decides), so identical all-template conversations still
    exact-dedup against each other while content-bearing ones are
    compared template-free."""
    boiler = F.broadcast(
        boiler_tokens.select(
            F.col("token").alias(token_col), F.lit(True).alias("_is_boiler")
        ).distinct()
    )
    joined = turns.join(boiler, [token_col], "left")
    content = joined.groupBy(conv_col).agg(
        F.max(
            F.when(
                F.col("_is_boiler").isNull() & F.col(token_col).isNotNull(),
                1,
            ).otherwise(0)
        ).alias("_has_content")
    )
    return (
        joined.join(content, conv_col)
        .withColumn(
            token_col,
            # untyped NULL literal: the when/otherwise resolves it to the
            # identity column's own type, whatever the caller uses
            F.when(
                F.col("_is_boiler").isNotNull() & (F.col("_has_content") == 1),
                F.lit(None),
            ).otherwise(F.col(token_col)),
        )
        .drop("_is_boiler", "_has_content")
    )
