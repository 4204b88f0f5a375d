"""Byte-exact encoded-file writer/parser (SURVEY.md §2.A #2, #22, #23).

The reference's on-disk artifact is a single concatenated token string per
file (writer /root/reference/lib/deduplicator.ex:132; fixed-width stateful
parser /root/reference/lib/deduplicator/binary_utils.ex:26-45). The engine's
canonical form is the token DataFrame (scales, columnar); this module adds
file-level parity:

- `encoded_file_string`: per-file ordered concatenation of tokens — used for
  byte-exact roundtrip tests. Ordering is explicit (sort_array over (line,
  token) structs); the heavy lifting stays distributed, only the final
  per-file string is wide (test-scale only, SURVEY.md §7 'what's hard' (b)).
- `parse_encoded_string`: the fixed-width parser as a generator expression —
  token i starts at a position derivable in closed form because literal
  tokens are exactly (1+chunk_size) chars and pointers (1+width) chars; a
  cumulative-offset walk is expressed with aggregate() over a position fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def encoded_file_string(tokens: DataFrame, file_col: str = "doc_id") -> DataFrame:
    """(file, line, token) → (file, encoded): ordered concatenation.
    collect_list order is nondeterministic → sort structs, then join."""
    return tokens.groupBy(file_col).agg(
        F.array_join(
            F.expr("transform(sort_array(collect_list(struct(line, token))), s -> s.token)"),
            "",
        ).alias("encoded")
    )


def parse_encoded_string(
    encoded: DataFrame,
    chunk_size: int,
    pointer_width: int = 4,
    file_col: str = "doc_id",
    encoded_col: str = "encoded",
) -> DataFrame:
    """(file, encoded) → (file, line, token): the reference's stateful
    fixed-width parse, re-expressed as a position FOLD inside aggregate():
    each step looks at the marker char at the current offset, takes
    (1+chunk_size) or (1+pointer_width) chars, and advances. Runs entirely
    in the JVM; one row per input file, parallel across files."""
    lit_w = 1 + chunk_size
    ptr_w = 1 + pointer_width
    # state: struct(pos, toks array). Upper bound on steps: every token is a
    # pointer (the shortest) → ceil(len / ptr_w) iterations; extra steps no-op.
    parse = F.expr(
        f"""
        aggregate(
          sequence(1, CASE WHEN length({encoded_col}) = 0 THEN 0
                           ELSE cast(ceil(length({encoded_col}) / {ptr_w}.0) AS INT) END),
          struct(cast(1 as int) AS pos, cast(array() as array<string>) AS toks),
          (acc, _) -> CASE
            WHEN acc.pos > length({encoded_col}) THEN acc
            WHEN substring({encoded_col}, acc.pos, 1) = '0'
              THEN struct(
                cast(least(acc.pos + {lit_w}, length({encoded_col}) + 1) as int) AS pos,
                array_append(acc.toks,
                  substring({encoded_col}, acc.pos,
                            least({lit_w}, length({encoded_col}) - acc.pos + 1))) AS toks)
            ELSE struct(
              cast(acc.pos + {ptr_w} as int) AS pos,
              array_append(acc.toks, substring({encoded_col}, acc.pos, {ptr_w})) AS toks)
          END,
          acc -> acc.toks)
        """
    )
    return encoded.select(
        file_col, F.posexplode(parse).alias("line", "token")
    ).withColumn("line", F.col("line").cast("long"))


def generated_filename() -> F.Column:
    """Output-name generation (#23, deduplicator.ex:217-224: md5 hex of
    epoch-ms). Deterministic variants belong in tests; this mirrors the
    reference's behavior."""
    return F.md5(F.concat(F.lit("dedup_"), F.unix_millis(F.current_timestamp()).cast("string")))


def frames_equal_unordered(a: DataFrame, b: DataFrame) -> bool:
    """Multiset equality (#22 — the reference's assert_file_equals oracle,
    test/deduplicator_test.exs:317-321, generalized): A and B contain exactly
    the same rows with multiplicity."""
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
