"""Deterministic, engine-portable sampling operators.

A training-data pipeline needs samples that are (a) reproducible across
runs and engines, (b) stratified (per-language / per-source quotas), and
(c) computable map-side with zero shuffle — membership must be a pure
function of the row, never of partitioning or iteration order. Spark's
``df.sample`` is none of these (seed interacts with partition layout), so
sampling here is hash-gated: keep a row iff a seeded portable
(md5-derived) hash of its id, mod 100, falls under the stratum's rate.

Reference: no sampling exists in the reference (beyond-reference
north-star component); the same primitive backs the q66 train/val/test
split.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.functions.hashing import seeded_hash64


def stratum_rate(strata_col: Column, rates: Mapping[str, int], default: int = 0) -> Column:
    """Percentage (0-100) quota for a row's stratum as a Column."""
    expr: Column = F.lit(default)
    for stratum, pct in sorted(rates.items()):
        expr = F.when(strata_col == stratum, F.lit(pct)).otherwise(expr)
    return expr


def stratified_hash_sample(
    df: DataFrame,
    *,
    id_col: str,
    strata_col: str,
    rates: Mapping[str, int],
    seed: str = "sample",
    default_pct: int = 0,
) -> DataFrame:
    """Keep each row iff ``seeded_hash(id) % 100 < rates[stratum]``.

    Pure row-local projection + filter: no shuffle, pushes past column
    pruning, and yields the identical sample on any cluster layout. The
    per-stratum expected rate is exact in distribution and, because the
    hash is shared across strata, samples for nested rate configs are
    monotone (a 10% sample is a subset of the 25% sample)."""
    bucket = seeded_hash64(F.col(id_col).cast("string"), seed) % 100
    return df.filter(bucket < stratum_rate(F.col(strata_col), rates, default_pct))


def priority_sample(
    df: DataFrame,
    *,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "pri",
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows without replacement —
    integer-floored priority sampling (Duffield, Lund & Thorup 2007).

    Each row draws the deterministic uniform ``u = seeded_hash(key)``
    (60-bit) and gets inverse priority ``q = u div w`` (``w`` a positive
    integer weight, e.g. cents); the sample is the k smallest ``q``
    (ties broken by key). Small ``q`` ⇔ large ``w/u``, so inclusion
    probability rises with weight, heavy rows are near-certain members,
    and the sample is reproducible across runs, engines, and partition
    layouts (unlike ``df.sample``). The floor keeps every comparison in
    BIGINT — engine-exact, no doubles anywhere.

    Plan shape: a map-side projection then a global top-k —
    TakeOrderedAndProject, so each partition keeps only its local k and
    the driver merges k-sized heaps; the input never shuffles. The final
    rank is a window over the already-collected k rows (bounded, k-row
    single partition by construction).

    Output: (key, weight, priority, rnk), rnk 1..k by (priority, key).
    """
    pri = df.select(
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("long").alias("weight"),
        seeded_hash64(F.col(key_col).cast("string"), seed).alias("_u"),
    ).select("key", "weight", F.expr("_u div weight").alias("priority"))
    top = pri.orderBy("priority", "key").limit(k)
    w = Window.orderBy("priority", "key")
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


def priority_sample_per_group(
    df: DataFrame,
    *,
    group_col: str,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "pri",
) -> DataFrame:
    """Per-group weighted sample: the k best priority-sample rows WITHIN
    each group (Duffield-Lund-Thorup priorities, as :func:`priority_sample`,
    but stratified). Global top-k keeps whole strata out of small samples;
    per-group k guarantees every stratum is represented — the shape used
    for per-source eval slices and per-language inspection samples.

    Plan shape: map-side priority projection, then ONE hash exchange on
    the group key feeding a bounded window (rank ≤ k) — no global sort,
    no driver merge; output is at most k rows per group regardless of
    input size. Contrast with :func:`priority_sample`'s
    TakeOrderedAndProject, which never shuffles but returns a single
    global k.

    Output: (group, key, weight, priority, rnk), rnk 1..k per group by
    (priority, key).
    """
    pri = df.select(
        F.col(group_col).alias("grp"),
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("long").alias("weight"),
        seeded_hash64(F.col(key_col).cast("string"), seed).alias("_u"),
    ).select("grp", "key", "weight", F.expr("_u div weight").alias("priority"))
    w = Window.partitionBy("grp").orderBy("priority", "key")
    return (
        pri.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .withColumnRenamed("grp", group_col)
    )


def temperature_mixture_sample(
    df: DataFrame,
    *,
    id_col: str,
    source_col: str,
    alpha: float = 0.5,
    target_fraction: float = 0.3,
    seed: str = "mix",
) -> DataFrame:
    """Temperature-based source mixing (the multinomial-smoothing step of
    GPT-3/PaLM-style data recipes): source s gets sampling mass
    p_s ∝ n_s^α, flattening the natural distribution toward uniform as
    α→0, and each row is kept by the same portable hash gate the other
    samplers use, at per-source rate

        rate_s = min(1, target_fraction · N · p_s / n_s)

    expressed in basis points (floor to int → engine-exact arithmetic
    after the pow/division, shared with the oracle).

    Plan shape: one partial-agg ``groupBy(source)`` for the counts (tiny
    output), rates computed on that dimension table, then a BROADCAST
    join back and a map-side hash filter — the corpus itself shuffles
    zero times. Derived rates are data-dependent, which is exactly what
    fixed-rate ``stratified_hash_sample`` cannot express."""
    counts = df.groupBy(F.col(source_col).alias("__src")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    totals = counts.agg(
        F.sum("__n").alias("__total"), F.sum(F.pow("__n", F.lit(alpha))).alias("__Z")
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        "__src",
        "__n",
        F.least(
            F.lit(10000),
            F.floor(
                F.lit(target_fraction)
                * F.col("__total")
                * (F.pow("__n", F.lit(alpha)) / F.col("__Z"))
                / F.col("__n")
                * 10000
            ),
        )
        .cast("long")
        .alias("__rate_bp"),
    )
    bucket = seeded_hash64(F.col(id_col).cast("string"), seed) % 10000
    return (
        df.join(F.broadcast(rates), F.col(source_col) == F.col("__src"))
        .filter(bucket < F.col("__rate_bp"))
        .drop("__src", "__n", "__rate_bp")
    )


def token_budget_sample(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    budget_tokens: int,
    seed: str = "epoch0",
    pregate_margin: float | None = None,
) -> DataFrame:
    """Token-budgeted epoch construction: per source, admit documents in
    a deterministic seeded-hash order until the cumulative whitespace-
    token count would exceed ``budget_tokens`` — the data-recipe step
    where the quota is TOKENS, not a document ratio (q79's temperature
    mix) or a per-group row count (priority_sample_per_group). Seeding
    gives reproducible epochs; a new seed is a fresh shuffle.

    Exact path: one exchange on source, a per-source window cumsum over
    (hash, id) order, keep ``cum_tokens <= budget``.

    Scale path (``pregate_margin``, e.g. 2.0): the admission order IS
    ascending hash order, so the admitted set is a PREFIX of the hash
    range — a map-side gate ``hash < frac · 2^60`` with
    ``frac = margin · budget / total_source_tokens`` keeps a superset
    of the final epoch, and the window then sorts only ~margin·budget
    tokens per source instead of the whole source. Output-identical to
    the exact path whenever the margin holds (pinned by test); the
    margin is enforced with a runtime assert_true — a gate that
    retained fewer than ``budget`` tokens while excluding rows fails
    loudly instead of silently shrinking the epoch.

    Output: (source, id, n_tokens, cum_tokens) for admitted documents.
    """
    from openstack_billing_from_db_spark.operators.text import token_count

    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive; got {budget_tokens}")
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).alias("n_tokens"),
        seeded_hash64(F.col(id_col).cast("string"), seed).alias("__h"),
        F.lit(budget_tokens).cast("long").alias("__budget"),
    )
    return _admit_token_prefix(
        base, pregate_margin=pregate_margin, caller="token_budget_sample"
    ).select("source", "id", "n_tokens", "cum_tokens")


def _admit_token_prefix(
    base: DataFrame,
    *,
    pregate_margin: float | None,
    caller: str,
) -> DataFrame:
    """Shared admission kernel for token-budgeted epochs. ``base`` has
    (source, id, n_tokens, __h, __budget) with ``__budget`` constant
    within a source (a literal for token_budget_sample, a broadcast-
    joined per-source quota for mixture_epoch_sample). Admits the
    seeded-hash prefix whose cumulative token count stays within the
    source's budget; returns the admitted rows plus ``cum_tokens`` and
    ``__budget``.

    Exact path: one exchange on source, a per-source window cumsum.
    Gated path (``pregate_margin`` > 1): the admitted set is a PREFIX
    of the hash range, so a map-side gate ``hash < frac · 2^60`` with
    ``frac = margin · budget / total_source_tokens`` keeps a superset,
    and the window sorts only ~margin·budget tokens per source —
    output-identical to the exact path or a loud ValueError.
    """
    if pregate_margin is not None:
        if pregate_margin <= 1.0:
            raise ValueError(
                f"pregate_margin must be > 1; got {pregate_margin}"
            )
        totals = base.groupBy("source").agg(
            F.sum("n_tokens").alias("__tot"),
            F.max("__budget").alias("__b"),
        )
        # hash space is 60 bits (functions/hashing.seeded_hash64). A
        # source with zero total tokens (every doc empty) gets the
        # full range — nothing to gate, and the exact path admits all
        # its rows at cum = 0 (found by the hypothesis kernel test:
        # ANSI mode turns budget/__tot into a DIVIDE_BY_ZERO there).
        cut = F.expr(
            f"CASE WHEN __tot <= 0 THEN CAST({1 << 60} AS BIGINT)"
            f" ELSE CAST(least(1.0, {pregate_margin} * __b / __tot)"
            f" * CAST({1 << 60} AS DOUBLE) AS BIGINT) END"
        )
        gated = (
            base.join(F.broadcast(totals), "source")
            .withColumn("__cut", cut)
            .filter((F.col("__h") < F.col("__cut")) | (F.col("__cut") >= (1 << 60)))
        )
        w = Window.partitionBy("source").orderBy("__h", "id")
        from openstack_billing_from_db_spark.operators.caching import (
            tracked_persist,
        )

        cum = tracked_persist(
            gated.withColumn(
                "cum_tokens", F.sum("n_tokens").over(w).cast("long")
            )
        )
        # the gate must have retained STRICTLY MORE than the budget for
        # every source it actually gated, or the prefix property is
        # broken — checked EAGERLY driver-side (an expression-level
        # assert_true would ride an otherwise-unused column and be
        # pruned away by Catalyst). Bounded barrier: ≤ 1 row.
        # Strictly-more (<= not <): at kept_tok == budget exactly, a
        # zero-token document whose hash fell beyond the cut would be
        # admitted by the exact path (its cumsum stays == budget) but
        # dropped by the gate — erring loudly here keeps the documented
        # "output-identical or fail loudly" contract at that boundary.
        bad = (
            cum.groupBy("source")
            .agg(
                F.max("cum_tokens").alias("kept_tok"),
                F.max("__budget").alias("bud"),
                F.max(F.col("__cut") < (1 << 60)).alias("gated_flag"),
            )
            .filter(F.col("gated_flag") & (F.col("kept_tok") <= F.col("bud")))
            .limit(1)
            .collect()
        )
        if not bad:
            # a source whose EVERY row was gated out leaves no cum row
            # at all — catch it by anti-joining the source list
            bad = (
                totals.join(
                    cum.select("source").distinct(), "source", "left_anti"
                )
                .select(
                    "source",
                    F.lit(0).alias("kept_tok"),
                    F.col("__b").alias("bud"),
                )
                .limit(1)
                .collect()
            )
        if bad:
            raise ValueError(
                f"{caller}: pregate_margin={pregate_margin} too "
                f"small — gate kept {bad[0].kept_tok} tokens for source "
                f"{bad[0].source!r}, not strictly above budget "
                f"{bad[0].bud}"
            )
        return cum.filter(F.col("cum_tokens") <= F.col("__budget")).select(
            "source", "id", "n_tokens", "cum_tokens", "__budget"
        )
    w = Window.partitionBy("source").orderBy("__h", "id")
    return (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= F.col("__budget"))
        .select("source", "id", "n_tokens", "cum_tokens", "__budget")
    )


def mixture_epoch_sample(
    docs: DataFrame,
    weights: DataFrame,
    *,
    total_budget_tokens: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    weight_col: str = "weight_micro",
    seed: str = "epoch0",
    pregate_margin: float | None = None,
) -> DataFrame:
    """Mixture-weighted epoch construction: split a GLOBAL token budget
    across sources in proportion to a domain-weight table (micro-units,
    e.g. doremi_domain_weights output), then admit each source's
    documents in deterministic seeded-hash order until its share is
    filled — the step that turns a data-mixing policy into an actual
    epoch. token_budget_sample is the uniform special case (every
    source gets the same quota); here the quota column rides a
    broadcast join of the tens-of-rows weight table.

    Per-source budget is exact integer arithmetic:
    ``budget_d = (total_budget_tokens * weight_micro) div 1e6`` —
    floor-division, so Σ budget_d ≤ total by at most n_sources partial
    tokens. Admission replays the q127 kernel (per-source window cumsum
    over (hash, id); hash-prefix pregate for scale) and is engine-exact.

    Output: (source, id, n_tokens, cum_tokens, budget_tokens) for
    admitted documents. Sources whose budget rounds below their
    smallest leading document admit nothing and simply emit no rows.
    """
    from openstack_billing_from_db_spark.operators.text import token_count

    if total_budget_tokens <= 0:
        raise ValueError(
            f"total_budget_tokens must be positive; got {total_budget_tokens}"
        )
    budgets = weights.select(
        F.col(source_col).alias("source"),
        F.expr(
            f"CAST(({total_budget_tokens} * {weight_col}) div 1000000"
            " AS BIGINT)"
        ).alias("__budget"),
    )
    if pregate_margin is not None:
        # the gate's superset guarantee needs a positive quota in every
        # gated source (frac=0 would drop rows the exact path keeps for
        # zero-token documents) — refuse loudly, tiny driver barrier
        starved = budgets.filter(F.col("__budget") <= 0).limit(1).collect()
        if starved:
            raise ValueError(
                "mixture_epoch_sample: pregate_margin requires every "
                f"per-source budget > 0; source {starved[0].source!r} "
                f"got {starved[0]['__budget']} of "
                f"{total_budget_tokens} — use the exact path or raise "
                "the total budget"
            )
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).alias("n_tokens"),
        seeded_hash64(F.col(id_col).cast("string"), seed).alias("__h"),
    ).join(F.broadcast(budgets), "source")
    return _admit_token_prefix(
        base, pregate_margin=pregate_margin, caller="mixture_epoch_sample"
    ).select(
        "source",
        "id",
        "n_tokens",
        "cum_tokens",
        F.col("__budget").alias("budget_tokens"),
    )


def dsir_importance_topk(
    docs: DataFrame,
    is_target: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    topk: int = 100,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): rank the RAW pool by
    how target-like each document's hashed n-gram profile is, so a
    pretraining mix can be tilted toward a small high-quality target
    set without training a classifier.

    Hashed bag-of-words features (portable 60-bit hash mod
    ``n_buckets``) give two multinomials — target vs raw — with add-one
    smoothing; a raw document's importance weight is

        log w(d) = Σ_b c_db · [ln p_target(b) − ln p_raw(b)]

    Cross-engine exactness: the per-BUCKET log-ratio is rounded once to
    integer MICRO-units (floor(x·1e6 + 0.5) — ≤ n_buckets ln calls per
    corpus, each engine's ln within an ulp, absorbed by the micro
    grid), and everything after is integer arithmetic: per-doc weight =
    Σ c·r_micro as BIGINT, ties broken by id.

    Scale shape: one token explode feeding (a) the n_buckets-row bucket
    histogram (map-side partial agg) and (b) per-(doc, bucket) counts;
    the scoring join is doc-features × the broadcast n_buckets-row
    ratio table; one global top-k. Nothing pairwise, nothing driver-side
    but the 1-row totals.

    Output: (id_col, logw_micro, rank) for the top-``topk`` raw docs by
    (logw_micro DESC, id).
    """
    from pyspark.sql import Window

    from openstack_billing_from_db_spark.functions.hashing import (
        portable_hash64,
    )
    from openstack_billing_from_db_spark.operators.caching import (
        tracked_persist,
    )
    from openstack_billing_from_db_spark.operators.text import words

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1; got {n_buckets}")
    B = int(n_buckets)
    toks = tracked_persist(
        docs.select(
            F.col(id_col).alias("did"),
            is_target.alias("tgt"),
            F.explode(words(F.col(text_col))).alias("w"),
        ).withColumn("bkt", portable_hash64(F.col("w")) % B)
    )
    cnt = toks.groupBy("bkt").agg(
        F.sum(F.when(F.col("tgt"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("tgt"), 0).otherwise(1)).alias("cs"),
    )
    tot = cnt.agg(
        F.sum("ct").alias("nt"), F.sum("cs").alias("ns")
    )
    r = cnt.crossJoin(F.broadcast(tot)).select(
        "bkt",
        F.expr(
            f"CAST(floor((ln(ct + 1.0) - ln(cs + 1.0)"
            f" + ln(CAST(ns + {B} AS DOUBLE))"
            f" - ln(CAST(nt + {B} AS DOUBLE))) * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("r_micro"),
    )
    feat = (
        toks.filter(~F.col("tgt"))
        .groupBy("did", "bkt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    logw = (
        feat.join(F.broadcast(r), "bkt")
        .groupBy("did")
        .agg(F.sum(F.col("c") * F.col("r_micro")).cast("long").alias("logw_micro"))
    )
    top = logw.orderBy(F.desc("logw_micro"), F.asc("did")).limit(topk)
    w = Window.orderBy(F.desc("logw_micro"), F.asc("did"))
    return top.select(
        F.col("did").alias(id_col),
        "logw_micro",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def doremi_domain_weights(
    kl: DataFrame,
    *,
    group_col: str = "source",
    kl_col: str = "kl_micro",
    eta_per_nat: int = 100,
    smooth_micro: int = 100_000,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023): exponentiated-
    gradient update of the training-mixture weights from per-domain
    excess loss, smoothed with the uniform distribution so no domain is
    starved. Here the excess-loss proxy is the per-domain unigram KL
    divergence from the corpus blend (``text.unigram_kl_divergence`` —
    exactly the cross-entropy(domain‖blend) − entropy(domain) gap a
    reference/proxy model pair measures), so domains farthest from the
    blend get upweighted: w_d ∝ exp(η·KL_d), then
    final_d = (1−c)·w_d + c·(1/n).

    Engine-exact: the ONLY float step is one exp() per domain, rounded
    ONCE to nano-units (floor(exp(η·kl)·1e9 + 0.5) — BIGINT); the
    normalization, smoothing, and mix are pure integer arithmetic
    (floor-div), so ``weight_micro`` replays identically in any engine.
    Floor-division means Σ weight_micro ≤ 1e6 by at most n micro-units
    — callers renormalize at consumption if exact unity matters.

    ``eta_per_nat`` is the step size per NAT of excess loss (the
    corpus-blend KLs here are ~0.01 nat, so η=100 spreads the weights
    ~2×; DoReMi's η=1 assumes unit-scale losses).

    Plan shape: input is one row per domain (already aggregated), the
    total is a 1-row broadcast — nothing corpus-sized is touched.
    """
    e = kl.select(
        F.col(group_col),
        F.col("n_tokens"),
        F.col(kl_col),
        F.expr(
            f"CAST(floor(exp(CAST({kl_col} AS DOUBLE) * {eta_per_nat} / 1000000)"
            " * 1000000000 + 0.5) AS BIGINT)"
        ).alias("e"),
    )
    tot = e.agg(
        F.sum("e").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    c = int(smooth_micro)
    return e.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_tokens",
        kl_col,
        F.expr(
            f"CAST((({1_000_000 - c}) * ((e * 1000000) div s)"
            f" + {c} * (1000000 div n)) div 1000000 AS BIGINT)"
        ).alias("weight_micro"),
    )


def neyman_allocation(
    df: DataFrame,
    *,
    group_col: str = "source",
    value_col: str = "quality_micro",
    total_samples: int,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation (Neyman 1934): when
    auditing a corpus metric with a fixed labeling budget, sample each
    stratum in proportion to n_d·σ_d — high-variance strata get more
    of the budget than proportional allocation gives them, minimizing
    the variance of the stratified mean estimator. The QA-design step
    between quality scoring (q31/q135's integer grid) and human review.

    Engine-exact by the round-once pattern: the per-stratum moment sums
    (Σv, Σv², n) are exact BIGINT aggregates; σ_d is ONE deterministic
    double expression (sqrt of the variance identity) rounded ONCE to
    integer units; every downstream step (weights n_d·σ_d, the two
    allocations) is BIGINT floor-arithmetic.

    Plan shape: one partial-aggregable groupBy over the corpus, then a
    1-row grand-total broadcast onto the tens-of-rows stratum table —
    nothing corpus-sized is exchanged.

    Output: (group, n_docs, mean_value, sd_value, alloc_neyman,
    alloc_prop) — value columns in the input's integer units.
    """
    if total_samples <= 0:
        raise ValueError(f"total_samples must be positive; got {total_samples}")
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(value_col).cast("long")).cast("long").alias("s"),
        F.sum(
            F.col(value_col).cast("long") * F.col(value_col).cast("long")
        ).cast("long").alias("ss"),
    )
    # one double step, rounded once — identical expression text in the
    # DuckDB oracle (neyman_allocation_sql)
    sd = g.withColumn(
        "sd",
        F.expr(
            "CAST(floor(sqrt(greatest(CAST(ss AS DOUBLE) / n"
            " - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n),"
            " 0.0)) + 0.5) AS BIGINT)"
        ),
    ).withColumn("w", F.expr("n * sd"))
    tot = sd.agg(
        F.sum("w").cast("long").alias("wt"),
        F.sum("n").cast("long").alias("nt"),
    )
    return (
        sd.crossJoin(F.broadcast(tot))
        .select(
            F.col("grp").alias(group_col),
            F.col("n").alias("n_docs"),
            # BIGINT div, not (s - s%n)/n double division: for corpus-scale
            # sums s > 2^53 the double rounds and breaks oracle parity
            # (values are nonnegative, so Spark div ≡ DuckDB //).
            F.expr("s div n").alias("mean_value"),
            F.col("sd").alias("sd_value"),
            F.expr(
                f"CAST(({total_samples} * w) div greatest(wt, 1) AS BIGINT)"
            ).alias("alloc_neyman"),
            F.expr(
                f"CAST(({total_samples} * n) div nt AS BIGINT)"
            ).alias("alloc_prop"),
        )
    )


def poisson_bootstrap_thresholds(max_k: int = 8) -> list[int]:
    """Integer thresholds T_k = floor(CDF_Poisson(1)(k) · 2^60) for
    k = 0..max_k-1, computed ONCE in Python — both engines replay the
    bootstrap weights as pure integer comparisons against a 60-bit
    seeded hash, so the resampling is deterministic and portable (no
    runtime float, no RNG state). A row's replicate weight is
    Σ_k [hash ≥ T_k], i.e. the inverse-CDF draw, capped at max_k."""
    import math

    probs = []
    p = math.exp(-1.0)
    for k in range(max_k):
        probs.append(p)
        p = p / (k + 1)
    out, cdf = [], 0.0
    for p in probs:
        cdf += p
        out.append(min(int(cdf * (1 << 60)), (1 << 60) - 1))
    return out


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    value_col: str = "quality_micro",
    n_replicas: int = 40,
    seed: str = "boot",
) -> DataFrame:
    """Poisson-bootstrap confidence interval for a corpus mean (Efron
    1979 via the streaming-friendly Poisson(1) reweighting of Chamandy
    et al. 2012): each replica b reweights every row by an independent
    Poisson(1) draw, and the spread of the replica means estimates the
    sampling uncertainty of the corpus-level metric — the missing error
    bar on quality dashboards (q31/q118 report point estimates only).

    Distributed shape — the reason Poisson bootstrap beats classical
    resampling at scale: replica weights are a pure function of
    (row id, replica index), so ALL replicas accumulate in ONE corpus
    scan as 2·B partial-aggregable sums (Σw·v, Σw per replica); no
    explode, no corpus×B blow-up, one 1-row exchange. The draws are
    seeded-hash inverse-CDF lookups against precomputed integer
    thresholds (poisson_bootstrap_thresholds), replica means are BIGINT
    floor-divisions, and the CI bounds are order statistics of the B
    means — engine-exact end to end.

    Output: one row (n_docs, point_mean, ci_lo, ci_hi, n_replicas)
    with the CI at the 2nd smallest / 2nd largest replica mean
    (≈ 95% for B = 40).
    """
    if n_replicas < 4:
        raise ValueError(f"n_replicas must be >= 4; got {n_replicas}")
    return bootstrap_finalize(
        bootstrap_partial(
            df,
            id_col=id_col,
            value_col=value_col,
            n_replicas=n_replicas,
            seed=seed,
        ),
        n_replicas=n_replicas,
    )


def bootstrap_partial(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    value_col: str = "quality_micro",
    n_replicas: int = 40,
    seed: str = "boot",
) -> DataFrame:
    """The bootstrap's MERGEABLE state for one slice of data: long-form
    rows (b, s, n) — replica b's Σw·v and Σw, plus the b = -1 row
    carrying the unweighted (Σv, count). Because every component is a
    sum, partials from disjoint slices merge by addition
    (:func:`bootstrap_merge` — the same partial/merge/finalize contract
    as the KMV/count-min/HLL sketches), which is what lets the CI
    accumulate over a stream with ~(B+1)-row state per micro-batch."""
    # single-parse SQL for the 2·B+2 aggregates and the long-form melt:
    # the per-replica expression build (B=40 × ~8 thresholds of chained
    # py4j Column calls) cost ~4 s of pure driver time per execution
    ts = poisson_bootstrap_thresholds()
    from openstack_billing_from_db_spark.functions.hashing import (
        spark_seeded_hash64_sql,
    )

    id_sql = f"CAST({id_col} AS STRING)"
    val_sql = f"CAST({value_col} AS BIGINT)"
    aggs = [
        "CAST(count(1) AS BIGINT) AS n_rows",
        f"CAST(sum({val_sql}) AS BIGINT) AS s_all",
    ]
    for b in range(n_replicas):
        h = spark_seeded_hash64_sql(id_sql, f"{seed}{b}")
        w = (
            "(0 + "
            + " + ".join(f"CAST(({h} >= {t}) AS BIGINT)" for t in ts)
            + ")"
        )
        aggs.append(f"CAST(sum({w} * {val_sql}) AS BIGINT) AS s{b}")
        aggs.append(f"CAST(sum({w}) AS BIGINT) AS n{b}")
    one = df.selectExpr(*aggs)
    structs = ", ".join(
        [
            "named_struct('b', CAST(-1 AS BIGINT), "
            "'s', CAST(coalesce(s_all, 0) AS BIGINT), "
            "'n', CAST(n_rows AS BIGINT))"
        ]
        + [
            f"named_struct('b', CAST({b} AS BIGINT), "
            f"'s', CAST(coalesce(s{b}, 0) AS BIGINT), "
            f"'n', CAST(coalesce(n{b}, 0) AS BIGINT))"
            for b in range(n_replicas)
        ]
    )
    return one.select(
        F.expr(f"explode(array({structs}))").alias("r")
    ).select("r.b", "r.s", "r.n")


def bootstrap_merge(partials: DataFrame) -> DataFrame:
    """Union of bootstrap partials → one state row per replica: plain
    addition, the sketch merge law."""
    return partials.groupBy("b").agg(
        F.sum("s").cast("long").alias("s"), F.sum("n").cast("long").alias("n")
    )


def bootstrap_finalize(partials: DataFrame, *, n_replicas: int) -> DataFrame:
    """Merged state → the one-row CI report (n_docs, point_mean, ci_lo,
    ci_hi, n_replicas). Joins nothing: the b = -1 total rides the same
    (B+1)-row frame through one tiny window + one aggregate — the
    ordering key (b ≥ 0, m, b) puts the total at rank 1 and the replica
    order statistics at ranks 2..B+1.

    The order statistics are derived from the STATE's replica count
    (window count − 1), not the ``n_replicas`` argument, so a caller
    passing a B that disagrees with the merged state cannot silently
    shift the CI ranks; the mismatch raises at execution instead
    (ADVICE r6)."""
    merged = bootstrap_merge(partials)
    rows = merged.select(
        "b",
        "n",
        F.expr("CAST(s div greatest(n, 1) AS BIGINT)").alias("m"),
    )
    w = Window.orderBy(F.col("b") >= 0, "m", "b")
    wall = Window.partitionBy(F.lit(1))
    ranked = rows.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(wall)
    )
    # assert_true returns NULL when the predicate holds (coalesced to a
    # +0 folded into EVERY row's mean below — not gated on any CASE
    # branch, so it fires even when the b = -1 total row is absent from
    # a malformed state; ADVICE r7) and throws when the merged state
    # disagrees with the caller's n_replicas. The replica-id bounds
    # (min b = -1, max b = B-1) pin ID-SET EQUALITY: b is distinct
    # after bootstrap_merge's groupBy, so count = B+1 with those
    # bounds means the ids are exactly {-1, 0 .. B-1} (ADVICE r7 —
    # this catches a stray replica id from a DIFFERENT B, e.g. a
    # B=41-sliced partial leaking b=40). What no (b, s, n) state can
    # witness is provenance: a B=20 partial's ids nest inside a
    # B=40 partial's, so that merge passes and double-counts replicas
    # 0..19 — merging partials built with different n_replicas is
    # caller-contract UB, the same rule every mergeable sketch here
    # has (KMV k, count-min (d, w), HLL p must match across slices).
    chk = F.coalesce(
        F.assert_true(
            (F.col("cnt") == F.lit(n_replicas + 1))
            & (F.min("b").over(wall) == F.lit(-1))
            & (F.max("b").over(wall) == F.lit(n_replicas - 1)),
            F.lit(
                "bootstrap_finalize: merged state replica ids != "
                f"{{-1, 0 .. {n_replicas - 1}}} (n_replicas={n_replicas})"
            ),
        ).cast("long"),
        F.lit(0),
    )
    ranked = ranked.withColumn("m", F.col("m") + chk)
    return ranked.agg(
        F.max(F.when(F.col("b") == -1, F.col("n"))).cast("long").alias(
            "n_docs"
        ),
        F.max(F.when(F.col("b") == -1, F.col("m"))).cast("long").alias(
            "point_mean"
        ),
        F.max(F.when(F.col("rn") == 3, F.col("m"))).cast("long").alias("ci_lo"),
        F.max(F.when(F.col("rn") == F.col("cnt") - 1, F.col("m")))
        .cast("long")
        .alias("ci_hi"),
        (F.count(F.lit(1)) - 1).cast("long").alias("n_replicas"),
    )
