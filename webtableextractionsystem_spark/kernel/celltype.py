"""Vectorized cell micro-type classifier (the reference's TypeTree leaf
assignment, /root/reference/src/tableExtract/TableItem.py:47-96).

The reference classifies one cell at a time with a 10-regex battery; here
classification runs ONCE per Arrow batch over a flat pandas Series holding
every cell of every table of every document in the batch (batched
tokenize+classify per the north star).

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


def classify_series(contents: pd.Series, has_img: np.ndarray) -> np.ndarray:
    """Classify a flat Series of cell contents -> int16 TYPE_INDEX ids.

    ``has_img`` is a boolean array: cells containing <img> are 图片
    regardless of text (TableItem.py:66-67).
    """
    s = contents.fillna("").astype(str).str.strip()
    hyper = s.str.match(RE_HYPERLINK).to_numpy()
    symbol = s.str.match(RE_SYMBOL).to_numpy()
    charnum = s.str.match(RE_CHARNUM).to_numpy()
    number = s.str.match(RE_NUMBER).to_numpy() & charnum
    le0 = s.str.match(RE_NUM_LE0).to_numpy() & number
    n01 = s.str.match(RE_NUM_0_1).to_numpy() & number
    ge1 = s.str.match(RE_NUM_GE1).to_numpy() & number
    chinese = s.str.match(RE_CHINESE).to_numpy() & charnum
    english = s.str.match(RE_ENGLISH).to_numpy() & charnum
    upper = s.str.match(RE_ENG_UPPER).to_numpy() & english
    lower = s.str.match(RE_ENG_LOWER).to_numpy() & english

    img = np.asarray(has_img, dtype=bool)
    conds = [
        img,
        hyper,
        symbol,
        le0,
        n01,
        ge1,
        number,
        chinese,
        upper,
        lower,
        english,
        charnum,
    ]
    choices = [
        _T["图片"],
        _T["超链接"],
        _T["标点类型"],
        _T["<=0"],
        _T["0-1"],
        _T[">=1"],
        _T["数字类型"],
        _T["中文"],
        _T["大写"],
        _T["小写"],
        _T["大小写混合"],
        _T["字符类型"],
    ]
    return np.select(conds, choices, default=_T["其他类型"]).astype(np.int16)


def classify_one(content: str, has_img: bool = False) -> int:
    """Single-cell convenience wrapper (tests / interactive use)."""
    return int(classify_series(pd.Series([content]), np.array([has_img]))[0])
