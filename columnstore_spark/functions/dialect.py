"""Two-dialect SQL builder: every training-data operator is ONE query
spine instantiated for Spark SQL and for DuckDB (the driver's
correctness oracle). Parity holds by construction — both engines run
the same logic, differing only in function spellings listed here.

Everything built on this stays JVM-side on Spark (pure Catalyst
expressions, whole-stage codegen, no Python in the hot path).

The portable 60-bit hash is the md5 prefix — bit-identical in both
engines (verified in tests/test_pipeline_parity.py):
    spark:  CAST(conv(substring(md5(x),1,15),16,10) AS BIGINT)
    duckdb: CAST(concat('0x',substr(md5(x),1,15)) AS BIGINT)
"""

from __future__ import annotations


class Dialect:
    spark: bool

    def ph(self, x: str) -> str:
        """Portable 60-bit hash of a string expression."""
        raise NotImplementedError

    # list/array function spellings
    def size(self, x: str) -> str: raise NotImplementedError
    def distinct(self, x: str) -> str: raise NotImplementedError
    def intersect(self, a: str, b: str) -> str: raise NotImplementedError
    def amin(self, x: str) -> str: raise NotImplementedError
    def amax(self, x: str) -> str: raise NotImplementedError
    def transform(self, x: str, f: str) -> str: raise NotImplementedError
    def filter(self, x: str, f: str) -> str: raise NotImplementedError
    def seq(self, a: str, b: str) -> str:
        """Inclusive integer sequence [a..b] as a list."""
        raise NotImplementedError
    def xor(self, a: str, b: str) -> str: raise NotImplementedError
    def shiftright(self, x: str, n: str) -> str: raise NotImplementedError
    def shiftleft(self, x: str, n: str) -> str: raise NotImplementedError
    def double_array(self, x: str) -> str: raise NotImplementedError
    def list_sum(self, x: str) -> str: raise NotImplementedError
    def element(self, x: str, i: str) -> str:
        """1-based list element access."""
        raise NotImplementedError

    def re_replace_all(self, x: str, pat: str) -> str:
        """Remove every match of `pat` from string expression `x`."""
        raise NotImplementedError
    def re_replace(self, x: str, pat: str, repl: str) -> str:
        """Replace every match of `pat` in `x` with literal `repl`."""
        raise NotImplementedError
    def contains(self, arr: str, x: str) -> str: raise NotImplementedError
    def str_lit_array(self, vals: list[str]) -> str:
        raise NotImplementedError
    def num_lit_array(self, vals: list[float]) -> str:
        raise NotImplementedError
    def join(self, arr: str, sep: str) -> str: raise NotImplementedError
    def union(self, a: str, b: str) -> str: raise NotImplementedError
    def explode_select(self, keys: str, arr: str, alias: str,
                       from_: str) -> str:
        """SELECT keys, <each element of arr> AS alias FROM from_."""
        raise NotImplementedError
    def dot(self, a: str, b: str) -> str: raise NotImplementedError
    def to_utf8(self, s: str) -> str: raise NotImplementedError
    def byte_length(self, s: str) -> str: raise NotImplementedError

    def first_utf8_byte(self, s: str) -> str:
        """First UTF-8 byte of string expression `s` as INT (0 if empty).

        Byte-based (not code-point-based ascii()) so it agrees with
        binary-side decoders for non-ASCII-leading text.
        """
        raise NotImplementedError

    def norm(self, x: str) -> str:
        return f"sqrt({self.dot(x, x)})"

    def cosine(self, a: str, b: str) -> str:
        return (f"({self.dot(a, b)} / "
                f"(({self.norm(a)}) * ({self.norm(b)})))")

    def tokens(self, s: str) -> str:
        """Lowercased alnum tokens of a string expression."""
        return self.filter(
            f"split(lower(trim({s})), '[^a-z0-9]+')" if self.spark else
            f"regexp_split_to_array(lower(trim({s})), '[^a-z0-9]+')",
            "x -> x != ''")

    def ws_tokens(self, s: str) -> str:
        """Whitespace-token array of a string expression — the ONE
        spelling token_stats, pack_sequences, and quality_filter share
        (a tokenizer tweak must move all of them or their counts
        silently diverge)."""
        arr = (f"split(trim({s}), ' +')" if self.spark
               else f"regexp_split_to_array(trim({s}), ' +')")
        return self.filter(arr, "x -> x != ''")

    def ws_token_count(self, s: str) -> str:
        """Whitespace-token count of a string expression."""
        return self.size(self.ws_tokens(s))

    def re_contains(self, x: str, pat: str) -> str:
        """Boolean: does string expression `x` contain a match of
        `pat`? (Engines spell the predicate differently.)"""
        raise NotImplementedError


    def rlit(self, pattern: str) -> str:
        """Regex pattern as a SQL string literal (engines differ on
        backslash handling inside single quotes)."""
        raise NotImplementedError

    def regexp_count(self, s: str, pattern: str) -> str:
        """Number of non-overlapping matches of `pattern` in `s`."""
        raise NotImplementedError

    def idiv(self, a: str, b: str) -> str:
        """Integer (floor-toward-zero) division of non-negative ints."""
        raise NotImplementedError

    def null_safe_eq(self, a: str, b: str) -> str:
        """NULL-safe equality predicate: true when both sides are NULL,
        never NULL itself (join keys over nullable columns)."""
        raise NotImplementedError


class SparkDialect(Dialect):
    spark = True

    def ph(self, x):
        return f"CAST(conv(substring(md5({x}),1,15),16,10) AS BIGINT)"

    def size(self, x): return f"size({x})"
    def distinct(self, x): return f"array_distinct({x})"
    def intersect(self, a, b): return f"array_intersect({a}, {b})"
    def amin(self, x): return f"array_min({x})"
    def amax(self, x): return f"array_max({x})"
    def transform(self, x, f): return f"transform({x}, {f})"
    def filter(self, x, f): return f"filter({x}, {f})"
    def seq(self, a, b): return f"sequence({a}, {b})"
    def xor(self, a, b): return f"({a} ^ {b})"
    def shiftright(self, x, n): return f"shiftright({x}, {n})"
    def shiftleft(self, x, n): return f"shiftleft({x}, {n})"
    def double_array(self, x): return f"CAST({x} AS ARRAY<DOUBLE>)"
    def list_sum(self, x):
        return f"aggregate({x}, 0D, (acc, v) -> acc + v)"
    def element(self, x, i): return f"element_at({x}, {i})"
    def re_replace_all(self, x, pat):
        # route through rlit like re_replace: Spark literals consume
        # backslashes, so a raw f-string would desync vs DuckDB the
        # moment a pattern carries an escape
        return f"regexp_replace({x}, {self.rlit(pat)}, '')"
    def re_replace(self, x, pat, repl):
        return f"regexp_replace({x}, {self.rlit(pat)}, '{repl}')"
    def contains(self, arr, x): return f"array_contains({arr}, {x})"
    def str_lit_array(self, vals):
        return "array(" + ", ".join(f"'{v}'" for v in vals) + ")"
    def num_lit_array(self, vals):
        return "array(" + ", ".join(f"{v}D" for v in vals) + ")"
    def join(self, arr, sep): return f"array_join({arr}, '{sep}')"
    def union(self, a, b): return f"array_union({a}, {b})"
    def explode_select(self, keys, arr, alias, from_):
        return (f"SELECT {keys}, {alias} FROM {from_} "
                f"LATERAL VIEW explode({arr}) _ex AS {alias}")
    def dot(self, a, b):
        return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, "
                f"(acc, v) -> acc + v)")
    def rlit(self, pattern):
        # Spark string literals process backslash escapes
        return "'" + pattern.replace("\\", "\\\\") + "'"
    def regexp_count(self, s, pattern):
        return f"size(regexp_extract_all({s}, {self.rlit(pattern)}, 0))"
    def re_contains(self, x, pat):
        return f"({x} RLIKE {self.rlit(pat)})"
    def to_utf8(self, s): return f"encode({s}, 'utf-8')"
    def byte_length(self, s): return f"length(encode({s}, 'utf-8'))"
    def idiv(self, a, b): return f"(({a}) DIV ({b}))"
    def first_utf8_byte(self, s):
        return (f"CAST(CASE WHEN length({s}) > 0 THEN "
                f"conv(substr(hex(encode({s}, 'utf-8')), 1, 2), 16, 10) "
                f"ELSE 0 END AS INT)")
    def null_safe_eq(self, a, b): return f"({a} <=> {b})"


class DuckDialect(Dialect):
    spark = False

    def ph(self, x):
        return f"CAST(concat('0x',substr(md5({x}),1,15)) AS BIGINT)"

    def size(self, x): return f"len({x})"
    def distinct(self, x): return f"list_distinct({x})"
    def intersect(self, a, b): return f"list_intersect({a}, {b})"
    def amin(self, x): return f"list_aggregate({x}, 'min')"
    def amax(self, x): return f"list_aggregate({x}, 'max')"
    def transform(self, x, f): return f"list_transform({x}, {f})"
    def filter(self, x, f): return f"list_filter({x}, {f})"
    def seq(self, a, b): return f"range({a}, ({b}) + 1)"
    def xor(self, a, b): return f"xor({a}, {b})"
    def shiftright(self, x, n): return f"({x} >> ({n}))"
    def shiftleft(self, x, n): return f"({x} << ({n}))"
    def double_array(self, x): return f"CAST({x} AS DOUBLE[])"
    def list_sum(self, x): return f"list_sum({x})"
    def element(self, x, i): return f"list_extract({x}, {i})"
    def re_replace_all(self, x, pat):
        return f"regexp_replace({x}, '{pat}', '', 'g')"
    def re_replace(self, x, pat, repl):
        return f"regexp_replace({x}, {self.rlit(pat)}, '{repl}', 'g')"
    def contains(self, arr, x): return f"list_contains({arr}, {x})"
    def str_lit_array(self, vals):
        return "[" + ", ".join(f"'{v}'" for v in vals) + "]"
    def num_lit_array(self, vals):
        return "[" + ", ".join(f"CAST({v} AS DOUBLE)" for v in vals) + "]"
    def join(self, arr, sep):
        # duckdb array_to_string([]) is NULL where spark array_join([])
        # is '' — coalesce to keep empty-document behavior identical
        return f"COALESCE(array_to_string({arr}, '{sep}'), '')"
    def union(self, a, b):
        return f"list_distinct(list_concat({a}, {b}))"
    def explode_select(self, keys, arr, alias, from_):
        return f"SELECT {keys}, unnest({arr}) AS {alias} FROM {from_}"
    def dot(self, a, b): return f"list_dot_product({a}, {b})"
    def rlit(self, pattern):
        # DuckDB string literals keep backslashes verbatim
        return "'" + pattern + "'"
    def regexp_count(self, s, pattern):
        return f"len(regexp_extract_all({s}, {self.rlit(pattern)}))"
    def re_contains(self, x, pat):
        return f"regexp_matches({x}, {self.rlit(pat)})"
    def to_utf8(self, s): return f"encode({s})"
    def byte_length(self, s): return f"octet_length(encode({s}))"
    def idiv(self, a, b): return f"(({a}) // ({b}))"
    def first_utf8_byte(self, s):
        return (f"CAST(CASE WHEN octet_length(encode({s})) > 0 THEN "
                f"CAST(concat('0x', substr(hex(encode({s})), 1, 2)) AS INT) "
                f"ELSE 0 END AS INT)")
    def null_safe_eq(self, a, b): return f"({a} IS NOT DISTINCT FROM {b})"


SPARK = SparkDialect()
DUCK = DuckDialect()
