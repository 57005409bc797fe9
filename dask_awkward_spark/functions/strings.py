"""String kernels — Spark-native re-expression of the reference's
``dask_awkward.lib.str`` module (44 functions, lib/str.py; all partition-wise
Arrow-compute wrappers there).

Here every kernel is a Column expression applied at the array's list depth
(strings may sit inside nested lists), so they compose with the structural
operators and stay inside codegen. Split ops produce one extra list level,
mirroring the reference's ``split_*`` divisions behavior.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core import NestedArray
from ..schema import apply_at_depth


def _map(arr: NestedArray, fn) -> NestedArray:
    return arr._wrap(apply_at_depth(arr._col, arr.depth, fn))


# ---- case (lib/str.py:27,446,917,835,851) ----

def capitalize(arr): return _map(arr, lambda c: F.concat(F.upper(F.substring(c, 1, 1)), F.lower(F.substring(c, 2, 1 << 30))))
def lower(arr): return _map(arr, F.lower)
def upper(arr): return _map(arr, F.upper)
def swapcase(arr):
    # no builtin: per-char flip via transform over split characters
    return _map(
        arr,
        lambda c: F.array_join(
            F.transform(
                F.split(c, ""),
                lambda ch: F.when(ch == F.upper(ch), F.lower(ch)).otherwise(F.upper(ch)),
            ),
            "",
        ),
    )
def title(arr): return _map(arr, F.initcap)


# ---- predicates (lib/str.py:201-381) ----
# Unicode classes mirror the Arrow kernels the reference wraps:
# is_decimal = Nd only; is_digit = Nd + No (superscripts etc.);
# is_numeric = any N (adds Nl roman numerals, fractions). Java regex and
# DuckDB's RE2 both support \p{..} general categories, so the oracle twin
# uses the identical pattern. "Cased" is approximated as Ll/Lu/Lt in
# is_lower/is_upper/is_title (full Unicode adds Other_Lowercase/
# Other_Uppercase oddities like modifier ʰ and circled Ⓐ — not
# expressible as an RE2 general category; documented divergence).

def is_alnum(arr): return _map(arr, lambda c: c.rlike("^[\\p{L}\\p{N}]+$"))
def is_alpha(arr): return _map(arr, lambda c: c.rlike("^\\p{L}+$"))
def is_ascii(arr): return _map(arr, lambda c: c.rlike("^[\\x00-\\x7F]*$"))
def is_decimal(arr): return _map(arr, lambda c: c.rlike("^\\p{Nd}+$"))
def is_digit(arr): return _map(arr, lambda c: c.rlike("^[\\p{Nd}\\p{No}]+$"))
def is_lower(arr): return _map(arr, lambda c: c.rlike("\\p{Ll}") & ~c.rlike("[\\p{Lu}\\p{Lt}]"))
def is_numeric(arr): return _map(arr, lambda c: c.rlike("^\\p{N}+$"))
def is_printable(arr): return _map(arr, lambda c: c.rlike("^[\\x20-\\x7E]*$"))
def is_space(arr): return _map(arr, lambda c: c.rlike("^\\s+$"))
def is_title(arr):
    # Python/Arrow istitle: every maximal run of CASED chars (Ll/Lu/Lt)
    # must be one upper/title char followed by lowers, with >=1 such run;
    # UNCASED chars — digits, punctuation, and uncased letters (Lo/Lm,
    # e.g. CJK) — are transparent separators (Python's previous_is_cased
    # reset). ("A1a" is NOT title — 'a' restarts a word after the uncased
    # '1'; "AB"/"HELLO" are NOT title — consecutive uppers share a cased
    # run; "Hello世界" IS title — 世界 are uncased separators.)
    return _map(
        arr,
        lambda c: c.rlike(
            "^[^\\p{Ll}\\p{Lu}\\p{Lt}]*[\\p{Lu}\\p{Lt}]\\p{Ll}*"
            "(?:[^\\p{Ll}\\p{Lu}\\p{Lt}]+[\\p{Lu}\\p{Lt}]\\p{Ll}*)*[^\\p{Ll}\\p{Lu}\\p{Lt}]*$"
        ),
    )
def is_upper(arr): return _map(arr, lambda c: c.rlike("\\p{Lu}") & ~c.rlike("[\\p{Ll}\\p{Lt}]"))


# ---- pad / trim (lib/str.py:43-901) ----

def center(arr, width, padding=" "):
    def f(c):
        total = F.greatest(F.lit(width) - F.length(c), F.lit(0))
        left = F.floor(total / 2).cast("int")
        padded = F.rpad(F.concat(F.repeat(F.lit(padding), left), c), width, padding)
        # strings longer than width pass through unchanged (Python/Arrow
        # center semantics; rpad alone would truncate them)
        return F.when(F.length(c) >= width, c).otherwise(padded)
    return _map(arr, f)

def lpad(arr, width, padding=" "): return _map(arr, lambda c: F.lpad(c, width, padding))
def rpad(arr, width, padding=" "): return _map(arr, lambda c: F.rpad(c, width, padding))
def _char_class(characters: str) -> str:
    """Regex character class matching exactly the given characters —
    metachars like '-', ']', '\\' are escaped, not interpreted."""
    import re as _re

    return "[" + "".join(_re.escape(ch) for ch in characters) + "]"


def ltrim(arr, characters): return _map(arr, lambda c: F.regexp_replace(c, f"^{_char_class(characters)}+", ""))
def rtrim(arr, characters): return _map(arr, lambda c: F.regexp_replace(c, f"{_char_class(characters)}+$", ""))
def trim(arr, characters): return _map(arr, lambda c: F.regexp_replace(F.regexp_replace(c, f"^{_char_class(characters)}+", ""), f"{_char_class(characters)}+$", ""))
def ltrim_whitespace(arr): return _map(arr, F.ltrim)
def rtrim_whitespace(arr): return _map(arr, F.rtrim)
def trim_whitespace(arr): return _map(arr, F.trim)


# ---- search (lib/str.py:63-556) ----

def count_substring(arr, pattern):
    if not pattern:
        raise ValueError("count_substring pattern must be non-empty")
    return _map(arr, lambda c: ((F.length(c) - F.length(F.replace(c, F.lit(pattern), F.lit("")))) / len(pattern)).cast("int"))

def count_substring_regex(arr, pattern):
    return _map(arr, lambda c: F.size(F.split(c, pattern)) - 1)

def ends_with(arr, pattern): return _map(arr, lambda c: c.endswith(pattern))
def starts_with(arr, pattern): return _map(arr, lambda c: c.startswith(pattern))
def find_substring(arr, pattern): return _map(arr, lambda c: F.instr(c, pattern) - 1)
def find_substring_regex(arr, pattern):
    return _map(arr, lambda c: F.regexp_instr(c, F.lit(pattern)) - 1)
def match_like(arr, pattern): return _map(arr, lambda c: c.like(pattern))
def match_substring(arr, pattern): return _map(arr, lambda c: c.contains(pattern))
def match_substring_regex(arr, pattern): return _map(arr, lambda c: c.rlike(pattern))
def extract_regex(arr, pattern, group=1): return _map(arr, lambda c: F.regexp_extract(c, pattern, group))


# ---- transform (lib/str.py:594-730,430) ----

def replace_slice(arr, start, stop, replacement):
    return _map(arr, lambda c: F.concat(F.substring(c, 1, start), F.lit(replacement), F.substring(c, stop + 1, 1 << 30)))

def replace_substring(arr, pattern, replacement):
    return _map(arr, lambda c: F.replace(c, F.lit(pattern), F.lit(replacement)))

def replace_substring_regex(arr, pattern, replacement):
    return _map(arr, lambda c: F.regexp_replace(c, pattern, replacement))

def reverse(arr): return _map(arr, F.reverse)
def repeat(arr, n): return _map(arr, lambda c: F.repeat(c, n))
def slice(arr, start, stop=None):
    if stop is None:
        return _map(arr, lambda c: F.substring(c, start + 1, 1 << 30))
    return _map(arr, lambda c: F.substring(c, start + 1, stop - start))
def length(arr): return _map(arr, F.length)


# ---- split / join (lib/str.py:752-796,397,415) ----

def split_pattern(arr, pattern):
    import re as _re
    return _map(arr, lambda c: F.split(c, _re.escape(pattern)))

def split_pattern_regex(arr, pattern): return _map(arr, lambda c: F.split(c, pattern))
def split_whitespace(arr): return _map(arr, lambda c: F.split(F.trim(c), "\\s+"))

def join(arr, separator):
    """list of strings -> joined string (reference lib/str.py:397)."""
    return arr._wrap(apply_at_depth(arr._col, arr.depth - 1, lambda c: F.array_join(c, separator)))

def join_element_wise(arrs, separator):
    """concat_ws across congruent string arrays (lib/str.py:415)."""
    base = arrs[0]
    from ..schema import apply_at_depth2
    out = base._col
    for other in arrs[1:]:
        base._check_base(other)
        out = apply_at_depth2(out, other._col, base.depth, lambda a, b: F.concat_ws(separator, a, b))
    return base._wrap(out)


# ---- membership (lib/str.py:281,181,867) ----

def is_in(arr, values): return _map(arr, lambda c: c.isin(*values))
def index_in(arr, values):
    def f(c):
        expr = F.lit(-1)
        for i in range(len(values) - 1, -1, -1):
            expr = F.when(c == values[i], F.lit(i)).otherwise(expr)
        return expr
    return _map(arr, f)

def to_categorical(arr):
    """No first-class categorical in Spark (SURVEY §1.2) — dictionary
    encoding happens at the Parquet layer; identity for API parity."""
    return arr


def strings_astype(arr, to="double"):
    """String→numeric leaf cast (NotImplemented in the reference,
    lib/structure.py:861-868 — uplift; non-numeric strings become null
    via try-cast semantics)."""
    return _map(arr, lambda c: c.try_cast(to))
