"""PII masking / redaction / pseudonymization for training-data export.

A corpus leaving the curation pipeline for pretraining must not carry
raw identifiers. These operators are the standard trio:

- **redaction**: structural PII (emails, phones, IPv4) replaced with a
  type tag — regex patterns restricted to the subset shared by Java
  regex (Spark) and RE2 (DuckDB): no lookarounds, no backreferences,
  so the oracle can replay the exact same rewrite.
- **masking**: fixed-width account/ID numbers keep only a suffix
  (capture-group rewrite — lookahead is not RE2-expressible).
- **pseudonymization**: salted sha256 so keys stay joinable across
  tables without exposing the raw value.

All pure column expressions (regexp_replace / sha2) — map-only,
whole-stage codegen, no shuffle: at 100 TB this pass is scan-bound.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RE2-safe patterns (shared Java/RE2 subset; no lookaround).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9][0-9()\-. ]{6,}[0-9]"
IPV4_PATTERN = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"

EMAIL_TAG = "[EMAIL]"
PHONE_TAG = "[PHONE]"
IPV4_TAG = "[IP]"


def redact_emails(col: Column) -> Column:
    return F.regexp_replace(col, EMAIL_PATTERN, EMAIL_TAG)


def redact_phones(col: Column) -> Column:
    return F.regexp_replace(col, PHONE_PATTERN, PHONE_TAG)


def redact_ipv4(col: Column) -> Column:
    return F.regexp_replace(col, IPV4_PATTERN, IPV4_TAG)


def redact_pii(col: Column) -> Column:
    """All redactions. Order matters: emails first (they contain digit
    runs), then IPv4 BEFORE phones — the phone char class includes '.',
    so an unredacted dotted quad would be tagged [PHONE]."""
    return redact_phones(redact_ipv4(redact_emails(col)))


def mask_id_suffix(col: Column, width: int = 9, keep: int = 2) -> Column:
    """Mask a fixed-width digit run keeping the last ``keep`` digits:
    ``Customer#000000042`` -> ``Customer#*******42``. Capture-group
    rewrite (``([0-9]{w-k})([0-9]{k})`` -> ``***$2``) — the
    lookahead-free form both Java regex and RE2 accept."""
    pattern = f"[0-9]{{{width - keep}}}([0-9]{{{keep}}})"
    return F.regexp_replace(col, pattern, "*" * (width - keep) + "$1")


def pseudonymize(col: Column, salt: str) -> Column:
    """Salted sha256 hex digest: deterministic, joinable across tables
    pseudonymized with the same salt, irreversible without it."""
    return F.sha2(F.concat(F.lit(salt), col.cast("string")), 256)


def k_anonymity_report(df, quasi_cols: list[str], k: int = 5):
    """Per-equivalence-class k-anonymity audit (Sweeney 2002): group on
    the quasi-identifier columns and flag classes smaller than ``k`` —
    rows in such classes are re-identifiable by joining the quasi-ids
    against an external dataset, the canonical privacy failure of a
    published training corpus.

    Returns (quasi_cols..., group_size, violates_k). One partially-
    aggregated groupBy — shuffle volume is the distinct quasi-id
    combinations, not the corpus. Enforcement is `suppress_small_groups`
    (drop) or coarsening a quasi-id (generalization) and re-auditing.
    """
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("group_size")
    ).withColumn("violates_k", F.col("group_size") < k)


def suppress_small_groups(df, quasi_cols: list[str], k: int = 5):
    """k-anonymity enforcement by suppression: drop every row whose
    quasi-identifier equivalence class has fewer than ``k`` members.
    The violating-class set is aggregated (small: distinct quasi-id
    combinations) and anti-joined back — broadcast when it fits."""
    bad = (
        k_anonymity_report(df, quasi_cols, k)
        .filter(F.col("violates_k"))
        .select(*quasi_cols)
    )
    return df.join(F.broadcast(bad), quasi_cols, "left_anti")


def pii_detection_report(
    df,
    text_cols: list[str],
    group_col: str | list[str] | None = None,
):
    """PII DETECTION scan — the audit that runs before (and after) the
    redaction pass: per text column (optionally per ``group_col``
    stratum), how many rows contain each structural PII class and how
    many total occurrences, via the same RE2-safe patterns the redactors
    rewrite. "After" should report zeros; a nonzero post-redaction row
    is a release blocker.

    Returns one row per (group, column): (group?, column, n_rows,
    email_rows, phone_rows, ipv4_rows, email_hits, phone_hits,
    ipv4_hits). Pure regexp_count aggregates fused into ONE partially-
    aggregated pass over the corpus — at 100 TB the scan is the cost;
    all counters ride the same job, and per-column results come from a
    single unpivoted aggregate, not one pass per column.
    """
    pats = {
        "email": EMAIL_PATTERN,
        "phone": PHONE_PATTERN,
        "ipv4": IPV4_PATTERN,
    }
    if group_col is None:
        group_names: list[str] = []
    elif isinstance(group_col, str):
        group_names = [group_col]
    else:
        group_names = list(group_col)
    keys = [F.col(g) for g in group_names]
    key_names = group_names + ["column"]
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            *[
                F.regexp_count(F.col(c), F.lit(p)).alias(f"{name}_hits")
                for name, p in pats.items()
            ],
        )
        for c in text_cols
    ]
    exploded = df.select(*keys, F.explode(F.array(*per_col)).alias("s")).select(
        *key_names[:-1],
        F.col("s.column").alias("column"),
        *[F.col(f"s.{name}_hits").alias(f"{name}_hits") for name in pats],
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name in pats:
        aggs.append(
            F.sum((F.col(f"{name}_hits") > 0).cast("long")).alias(f"{name}_rows")
        )
    for name in pats:
        aggs.append(F.sum(f"{name}_hits").cast("long").alias(f"{name}_hits"))
    return exploded.groupBy(*key_names).agg(*aggs)


# ---------------------------------------------------------------------------
# Differentially private aggregate release (Laplace mechanism)
# ---------------------------------------------------------------------------

def _keyed_uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform in (0, 1) from md5(key:salt) — the
    repo-wide seeded-sampling idiom (32 hash bits, +0.5 centering keeps
    the value strictly inside the open interval)."""
    hx = F.substring(F.md5(F.concat_ws(":", key, F.lit(salt))), 1, 8)
    return (F.conv(hx, 16, 10).cast("double") + F.lit(0.5)) / F.lit(4294967296.0)


def laplace_noise(key: Column, scale: float, salt: str) -> Column:
    """Laplace(0, scale) noise by inverse-CDF transform of the keyed
    uniform: -scale * sign(u - 1/2) * ln(1 - 2|u - 1/2|).

    The noise is a pure function of (key, salt) — the keyed-noise
    variant of the mechanism used for CONSISTENT releases (re-running
    the release must not hand an attacker fresh noise draws to average
    away; cf. the reproducible-noise requirement of census-style
    publication systems). Swap the salt per release epoch to
    re-randomize; swap ``_keyed_uniform`` for a CSPRNG stream where
    consistency is not wanted.
    """
    u = _keyed_uniform(key, salt) - F.lit(0.5)
    return (
        F.lit(-float(scale))
        * F.signum(u)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    )


def dp_release_counts(
    df,
    group_cols: list[str],
    epsilon: float = 1.0,
    salt: str = "dp",
    round_to: int = 4,
):
    """epsilon-DP per-group count release via the Laplace mechanism:
    a unit-count query has L1 sensitivity 1 (one individual changes one
    group's count by 1), so noise is Laplace(1/epsilon) keyed on the
    group value. Emits (group_cols..., noisy_count) — the true count
    never leaves the aggregation.

    Plan shape: one partial-aggregated groupBy + map-only noise
    arithmetic on the (tiny) group domain — the corpus-sized work is
    the count itself. The privacy guarantee is per-release; publishing
    k disjoint group-bys costs k*epsilon under basic composition
    (callers budget accordingly).
    """
    key = F.concat_ws("", *[F.col(c).cast("string") for c in group_cols])
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            *group_cols,
            F.round(
                F.col("__n") + laplace_noise(key, 1.0 / epsilon, salt),
                round_to,
            ).alias("noisy_count"),
        )
    )


def dp_release_sums(
    df,
    group_cols: list[str],
    value_col: str,
    clip: float,
    epsilon: float = 1.0,
    salt: str = "dp",
    round_to: int = 4,
):
    """epsilon-DP per-group sum release: each contribution is clipped
    to [0, clip] (bounding L1 sensitivity at ``clip``), then
    Laplace(clip/epsilon) noise is added per group. Clipping before
    aggregation is what makes the sensitivity claim true — a single
    unbounded value would otherwise carry unbounded influence."""
    key = F.concat_ws("", *[F.col(c).cast("string") for c in group_cols])
    clipped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(0.0)),
        F.lit(float(clip)),
    )
    return (
        df.groupBy(*group_cols)
        .agg(F.sum(clipped).alias("__s"))
        .select(
            *group_cols,
            F.round(
                F.col("__s") + laplace_noise(key, float(clip) / epsilon, salt),
                round_to,
            ).alias("noisy_sum"),
        )
    )
