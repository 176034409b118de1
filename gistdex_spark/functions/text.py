"""Text primitives: tokenization, word-match scoring, stop words.

Reference semantics ported (not copied):
- query tokenization: ``lower().split(/\\s+/)`` keep non-empty
  (`src/core/search/search.ts:14-19`).
- word-match count: number of query words contained as case-insensitive
  substrings of the content (`search.ts:34-40,116-124`).
- multilingual tokenizer: split on whitespace + CJK punctuation
  (`src/mcp/utils/stop-words.ts:222-253`); the EN+JA stop-word lists below
  are the reference's verbatim (`stop-words.ts:8-206`, MIT) — data, not
  code, and required so keyword analytics agree with reference output.

Each helper has a Spark-Column form and a SQL-string form so the DuckDB
oracle runs the byte-identical formula.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stop-word DATA matching the reference's lists verbatim
# (`stop-words.ts:8-206`) so keyword analytics agree with reference output
# on both EN and JA text. These are standard public stop-word inventories.
STOP_WORDS_EN = sorted({
    "a", "an", "the", "and", "or", "but", "nor", "yet", "so", "in", "on",
    "at", "to", "for", "of", "with", "by", "from", "about", "into",
    "through", "during", "before", "after", "above", "below", "between",
    "under", "over", "i", "you", "he", "she", "it", "we", "they", "me",
    "him", "her", "us", "them", "my", "your", "his", "its", "our", "their",
    "this", "that", "these", "those", "is", "am", "are", "was", "were",
    "be", "been", "being", "have", "has", "had", "having", "do", "does",
    "did", "doing", "will", "would", "could", "should", "may", "might",
    "must", "shall", "can", "need", "dare", "ought", "used", "what",
    "which", "who", "whom", "whose", "when", "where", "why", "how", "not",
    "no", "too", "very", "just", "only", "quite", "now", "then", "once",
    "here", "there", "all", "any", "each", "few", "more", "most", "other",
    "some", "such", "both", "either", "neither", "many", "much", "another",
    "own", "same", "than", "up", "down", "out", "off", "again", "further",
    "also", "back", "well", "even", "still", "way", "because", "however",
    "if", "unless", "until", "while", "although", "though", "since", "as",
})
STOP_WORDS_JA = sorted({
    "の", "に", "は", "を", "た", "が", "で", "て", "と", "し", "れ", "さ",
    "ある", "いる", "も", "する", "から", "な", "こと", "として", "い",
    "や", "など", "なる", "へ", "か", "だ", "これ", "それ", "あれ",
    "この", "その", "あの", "です", "ます", "でした", "ました",
})
STOP_WORDS = set(STOP_WORDS_EN) | set(STOP_WORDS_JA)

# Whitespace + punctuation splitter, verbatim from `stop-words.ts:230`
# (ASCII + fullwidth CJK punctuation + ideographic space).
TOKEN_SPLIT_RE = (
    "[\\s　,;.!?()\\[\\]{}:\"'"
    "。、！？「」『』（）【】〈〉《》〔〕［］｛｝・]+"
)


def query_words(query: str) -> list[str]:
    """lower().split(whitespace), non-empty — reference `search.ts:14-19`."""
    return [w for w in re.split(r"\s+", query.lower()) if w]


def match_count(content: Column | str, words: list[str]) -> Column:
    """#query words contained (case-insensitive substring) in content."""
    content = F.col(content) if isinstance(content, str) else content
    if not words:
        return F.lit(0)
    low = F.lower(content)
    terms = [F.when(F.instr(low, w.lower()) > 0, 1).otherwise(0) for w in words]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def sql_match_count(content_sql: str, words: list[str]) -> str:
    """DuckDB SQL for the same substring match count."""
    if not words:
        return "0"
    terms = [
        f"(CASE WHEN instr(lower({content_sql}), '{w.lower()}') > 0 THEN 1 ELSE 0 END)"
        for w in words
    ]
    return "(" + " + ".join(terms) + ")"


def tokens(content: Column | str) -> Column:
    """Multilingual token array: split + lower, drop empties."""
    content = F.col(content) if isinstance(content, str) else content
    return F.filter(
        F.split(F.lower(content), TOKEN_SPLIT_RE), lambda w: F.length(w) > 0
    )


def sql_tokens(content_sql: str) -> str:
    """DuckDB equivalent of :func:`tokens` (regexp split, drop empties)."""
    pat = TOKEN_SPLIT_RE.replace("'", "''")  # SQL-literal quote escape
    return (
        f"list_filter(regexp_split_to_array(lower({content_sql}), "
        f"'{pat}'), w -> length(w) > 0)"
    )


def sql_stopword_list() -> str:
    return "[" + ", ".join(f"'{w}'" for w in sorted(STOP_WORDS)) + "]"


def sql_stopword_list_en() -> str:
    return "[" + ", ".join(f"'{w}'" for w in sorted(STOP_WORDS_EN)) + "]"


def stopword_array() -> Column:
    return F.lit(sorted(STOP_WORDS))
