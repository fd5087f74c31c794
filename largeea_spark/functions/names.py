"""Entity-name normalization + tokenization (SURVEY.md P1/P2/F3/F4).

Reference semantics reproduced exactly (parity-critical; the per-url
byte-identical invariant of BASELINE.json depends on these being pure
string→string functions):

- P1 prefix strip: first regex match of ``http(s)?://[a-z.]+/[^/]+/``
  *searched* anywhere in the URI; keep the suffix after the match end;
  URIs without a match pass through whole (`text_utils.py:21,114-130`).
- P2 punctuation removal: every char in ``string.punctuation`` EXCEPT
  ``_`` becomes a single space; all other chars (incl. unicode) kept;
  NO lowercasing, NO whitespace collapsing (`text_utils.py:92-111`).
- F3 whitespace tokenize: Python ``str.split()`` semantics — split on
  runs of whitespace, drop empties (`text_utils.py:177-181`).
- F4 underscore tokenize: ``set(name.split('_'))`` — the MinHash token
  set (`text_sim.py:184-186`); empties are kept by Python's
  ``'a__b'.split('_')`` → we keep them too for parity.
"""

from __future__ import annotations

import string

from pyspark.sql import Column, functions as F

# `text_utils.py:21` — [a-z.] host chars, any scheme http/https.
URI_PREFIX = r"http(s)?://[a-z.]+/[^/]+/"

# `text_utils.py:92-103` — string.punctuation minus '_'.
_PUNC = "".join(c for c in string.punctuation if c != "_")


def strip_uri_prefix(col: Column | str) -> Column:
    """P1: drop everything up to and including the first URI-prefix match.

    The reference uses ``p.search`` then keeps ``ent[end:]``
    (`text_utils.py:119-125`). ``regexp_replace`` with the anchored-free
    pattern replaces the FIRST match only when the pattern is wrapped as
    ``^.*?PREFIX`` — instead we replace ``^(.*?)(PREFIX)`` keeping group
    semantics simple: since the reference keeps only the part AFTER the
    first match (discarding any junk BEFORE it too — span end), we
    replace ``.*?PREFIX`` anchored at start-of-string-or-anywhere once.
    """
    c = F.col(col) if isinstance(col, str) else col
    # Replace the first occurrence of (anything non-greedy)(prefix) with ''.
    # Java regex: use replaceFirst semantics via regexp_replace on an
    # anchored pattern — regexp_replace replaces ALL matches, so anchor it.
    return F.regexp_replace(c, r"^[\s\S]*?" + URI_PREFIX, "")


def remove_punct(col: Column | str) -> Column:
    """P2: punctuation (except ``_``) → single space. `text_utils.py:106-111`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, _PUNC, " " * len(_PUNC))


def normalize_name(col: Column | str, punct_to_space: bool = True) -> Column:
    """P1 (+ optionally P2), in the reference's order (`text_sim.py:228`)."""
    out = strip_uri_prefix(col)
    if punct_to_space:
        out = remove_punct(out)
    return out


def tokenize_ws(col: Column | str) -> Column:
    """F3: Python ``str.split()`` — runs of whitespace, no empty tokens.

    ``F.split(trim(s), '\\s+')`` on an empty/whitespace-only string
    yields ``[""]`` (one empty token), where Python yields ``[]`` — the
    ``array_remove`` drops it so empty docs contribute no postings to
    tf_idf / token similarity / langid voting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.trim(c), r"\s+"), "")


def underscore_token_set(col: Column | str) -> Column:
    """F4: ``set(name.split('_'))`` — distinct underscore tokens
    (`text_sim.py:184-186`). Keeps empty-string tokens like Python does."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(F.split(c, "_", -1))
