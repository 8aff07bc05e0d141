"""Edit-distance-1 vocabulary self-join via deletion neighborhoods
(extension tier — no reference counterpart; the scheme is the public
FastSS / SymSpell symmetric-delete blocking).

Why not brute force: an N-term vocabulary has N²/2 candidate pairs —
at a 100 M-term web-corpus vocabulary that is 5×10¹⁵ levenshtein
evaluations.  The deletion neighborhood of a term (the term plus every
single-character deletion) has L+1 members; two terms within edit
distance 1 ALWAYS share a neighborhood member:

- substitution at i: deleting position i from both sides yields the
  same string;
- insertion/deletion: the shorter term IS a deletion variant of the
  longer one (and every term's own surface form is in its
  neighborhood).

So an equi-join on exploded neighborhood keys is a SOUND AND COMPLETE
candidate generator for distance <= 1: O(N·L) keys shuffle instead of
O(N²) pairs, and the exact ``levenshtein`` check runs only on
candidates that share a key.  (For distance d the same scheme uses all
<=d-deletion variants; d=1 is the typo-canonicalization case shipped
here.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_neighborhood(col: Column | str) -> Column:
    """Array of the term plus each single-character-deletion variant
    (deduplicated — repeated characters collapse variants)."""
    t = F.col(col) if isinstance(col, str) else col
    dels = F.transform(
        F.sequence(F.lit(1), F.length(t)),
        lambda i: F.concat(
            t.substr(F.lit(1), i - F.lit(1)), t.substr(i + F.lit(1), F.length(t))
        ),
    )
    return F.array_union(F.array(t), dels)


def fuzzy_pairs(vocab: DataFrame, term_col: str = "term") -> DataFrame:
    """All unordered pairs of DISTINCT vocabulary terms at levenshtein
    distance exactly 1, as (``a``, ``b``) with ``a < b``.

    Plan shape: one explode (N·(L+1) rows), one equi-join on the
    8-to-40-byte neighborhood key, a distinct over the candidate pairs
    (two variants of the same pair can collide on different keys), then
    the exact levenshtein filter — which runs on candidates only, never
    on the cross product.  Hot keys are short variants shared by many
    terms ("a" is a deletion of every two-letter term); the production
    refinement when that bites is keying on (variant, length(term) div
    2) — lengths differing by >1 cannot be within distance 1, so the
    band splits hot short-variant buckets without losing a true pair.
    Not applied here: real vocabularies put negligible mass below 3
    characters, and the differential gate keys on the plain variant."""
    v = vocab.select(F.col(term_col).alias("term")).filter(
        F.col("term").isNotNull() & (F.length("term") > 0)
    ).distinct()
    nb = v.select(
        "term", F.explode(deletion_neighborhood("term")).alias("vkey")
    )
    left = nb.alias("l")
    right = nb.alias("r")
    cand = (
        left.join(right, F.col("l.vkey") == F.col("r.vkey"))
        .filter(F.col("l.term") < F.col("r.term"))
        .select(F.col("l.term").alias("a"), F.col("r.term").alias("b"))
        .distinct()
    )
    return cand.filter(F.levenshtein("a", "b") == 1)
