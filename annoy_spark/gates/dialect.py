"""Two-dialect SQL fragments with bit-identical semantics.

The driver's correctness gate runs each Spark query side-by-side with a DuckDB
oracle and compares value-hashes, so every gate query is generated from ONE
template through two dialects whose arithmetic agrees exactly:

- integers come from md5 hex prefixes (md5 is identical everywhere);
- all hashing/minhashing is int64 modular arithmetic (no overflow by
  construction: operands bounded so products stay < 2^62);
- floats appear only as single IEEE ops on exact integers (one division,
  one sqrt) which are correctly rounded and therefore bit-identical;
- float *sums* (order-dependent) never occur: vector math is integer-quantized
  first ("q = floor(x*SCALE + 0.5)"), making addition associative.

This module is the portable *reference semantics*; the scale implementations
in annoy_spark.operators / annoy_spark.functions are tested against it.
"""

from __future__ import annotations

from dataclasses import dataclass

# Mersenne prime 2^31-1: the minhash modulus must sit just above the reduced
# hash domain so (a*h+b) mod P wraps many times and actually permutes the
# domain (a too-large modulus is monotonic in h — broken minhash). With
# a, b, h < 2^31 every intermediate stays < 2^62 — no int64 overflow in
# either engine.
MERSENNE_P = (1 << 31) - 1


@dataclass(frozen=True)
class Dialect:
    name: str

    # --- tokenization ----------------------------------------------------
    def tokens(self, expr: str) -> str:
        """lowercase word tokens, empty strings removed."""
        if self.name == "spark":
            return f"filter(split(lower({expr}), '[^a-z0-9]+'), x -> x <> '')"
        return (
            f"list_filter(regexp_split_to_array(lower({expr}), '[^a-z0-9]+'),"
            f" x -> x <> '')"
        )

    def shingles(self, toks: str, k: int) -> str:
        """k-token shingles joined by space; short docs yield one shingle."""
        if self.name == "spark":
            return (
                f"CASE WHEN size({toks}) >= {k} THEN "
                f"transform(sequence(1, size({toks}) - {k - 1}), "
                f"i -> concat_ws(' ', slice({toks}, i, {k}))) "
                f"ELSE array(concat_ws(' ', {toks})) END"
            )
        return (
            f"CASE WHEN len({toks}) >= {k} THEN "
            f"list_transform(range(1, len({toks}) - {k - 2}), "
            f"i -> array_to_string({toks}[i:i+{k - 1}], ' ')) "
            f"ELSE [array_to_string({toks}, ' ')] END"
        )

    # --- hashing ----------------------------------------------------------
    def hex2int(self, expr: str, nhex: int = 8) -> str:
        """md5 hex prefix of `expr` as a non-negative BIGINT (< 16^nhex)."""
        if self.name == "spark":
            return f"CAST(conv(substr(md5({expr}), 1, {nhex}), 16, 10) AS BIGINT)"
        return f"CAST(('0x' || substr(md5({expr}), 1, {nhex})) AS BIGINT)"

    def sha256hex(self, expr: str) -> str:
        return f"sha2({expr}, 256)" if self.name == "spark" else f"sha256({expr})"

    # --- bit ops ------------------------------------------------------------
    def xor(self, a: str, b: str) -> str:
        return f"({a} ^ {b})" if self.name == "spark" else f"xor({a}, {b})"

    def shiftleft(self, a: str, n: int) -> str:
        if self.name == "spark":
            return f"shiftleft(CAST({a} AS BIGINT), {n})"
        return f"(CAST({a} AS BIGINT) << {n})"

    def shiftright(self, a: str, n: int) -> str:
        # operands are always non-negative here, so arithmetic shift is fine
        if self.name == "spark":
            return f"shiftright(CAST({a} AS BIGINT), {n})"
        return f"(CAST({a} AS BIGINT) >> {n})"

    def bit_count(self, expr: str) -> str:
        return f"bit_count({expr})"

    # --- arrays -------------------------------------------------------------
    def size(self, expr: str) -> str:
        return f"size({expr})" if self.name == "spark" else f"len({expr})"

    def array_distinct(self, expr: str) -> str:
        return (
            f"array_distinct({expr})" if self.name == "spark"
            else f"list_distinct({expr})"
        )

    def explode(self, expr: str, alias: str) -> str:
        """SELECT-clause explode; one output row per element."""
        if self.name == "spark":
            return f"explode({expr}) AS {alias}"
        return f"unnest({expr}) AS {alias}"

    def array_sort(self, expr: str) -> str:
        return f"array_sort({expr})" if self.name == "spark" else f"list_sort({expr})"

    def array_slice(self, expr: str, start1: int, length: int) -> str:
        if self.name == "spark":
            return f"slice({expr}, {start1}, {length})"
        return f"({expr})[{start1}:{start1 + length - 1}]"

    def array_join_ints(self, expr: str, sep: str = "_") -> str:
        if self.name == "spark":
            return f"array_join(transform({expr}, x -> CAST(x AS STRING)), '{sep}')"
        return f"array_to_string({expr}, '{sep}')"

    def int_dot(self, a: str, b: str) -> str:
        """Dot product of two equal-length BIGINT arrays (exact)."""
        if self.name == "spark":
            return (
                f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
                f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            )
        return (
            f"CAST(list_sum(list_transform(range(1, len({a}) + 1), "
            f"i -> ({a})[i] * ({b})[i])) AS BIGINT)"
        )

    def int_l1(self, a: str, b: str) -> str:
        """Manhattan distance of two equal-length BIGINT arrays (exact)."""
        if self.name == "spark":
            return (
                f"aggregate(zip_with({a}, {b}, (x, y) -> abs(x - y)), "
                f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            )
        return (
            f"CAST(list_sum(list_transform(range(1, len({a}) + 1), "
            f"i -> abs(({a})[i] - ({b})[i]))) AS BIGINT)"
        )

    def quantize(self, arr: str, scale: int) -> str:
        """float array -> BIGINT array: floor(x*scale + 0.5). Exact IEEE ops
        on dyadic-rational float32 inputs -> identical in both engines."""
        if self.name == "spark":
            return (
                f"transform({arr}, x -> CAST(floor(CAST(x AS DOUBLE) * {scale}"
                f" + 0.5) AS BIGINT))"
            )
        return (
            f"list_transform({arr}, x -> CAST(floor(CAST(x AS DOUBLE) * {scale}"
            f" + 0.5) AS BIGINT))"
        )

    # --- misc ---------------------------------------------------------------
    def regexp_replace_all(self, expr: str, pattern: str, repl: str) -> str:
        if self.name == "spark":
            return f"regexp_replace({expr}, '{pattern}', '{repl}')"
        return f"regexp_replace({expr}, '{pattern}', '{repl}', 'g')"

    def big_sum(self, expr: str) -> str:
        """SUM that stays BIGINT (DuckDB sums ints to HUGEINT)."""
        return f"CAST(sum({expr}) AS BIGINT)"


SPARK = Dialect("spark")
DUCK = Dialect("duck")
