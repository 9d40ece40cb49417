"""Pinned classification lexicons and the cell TypeTree.

The reference loads these from mutable JSON files under
``file/configuration/PersonTable/`` and mutates ``personInfo.json`` at
runtime (fusionJsonWord, /root/reference/src/tableExtract/table.py:799-809).
For determinism the rebuild pins frozen copies (FIXTURES.md §3) and
broadcasts them to executors as plain Python constants (they are tiny).

The TypeTree (16-node cell-type taxonomy,
/root/reference/src/tableExtract/table.py:1062-1089) is materialized here as
a precomputed 16x16 integer distance matrix so the orientation feature
(getTypeCharacter, table.py:1091-1126) becomes vectorized numpy fancy
indexing instead of per-cell tree walks.
"""

from __future__ import annotations

import numpy as np

# --- lexicons (exact reference contents; personInfo pinned per FIXTURES §3) ---

PERSON_NAME_HEADERS = (
    "人名", "姓名", "本名", "中文名", "英文名", "演员名", "人员", "者", "导演",
)  # file/configuration/PersonTable/personName.json

PROPERTY_RELATIONSHIP = ("关系", "称谓", "辈分", "亲属")
# file/configuration/PersonTable/propertyRelationship.json

CAPTION_RELATIONSHIP = ("女", "兄", "弟", "妹", "友", "妻", "儿", "妃", "亲属", "家族")
# file/configuration/PersonTable/captionRelationship.json

# personInfo.json self-mutates in the reference; FIXTURES.md §3 pins a fixed
# seed set including 中文名/本名 (typical Baidu-Baike person properties).
PERSON_INFO_PROPERTIES = frozenset(
    {
        "中文名", "本名", "别名", "国籍", "民族", "出生日期", "逝世日期",
        "出生地", "职业", "毕业院校", "主要成就", "代表作品", "字", "号",
    }
)

FIRST_PROPERTY = frozenset({"中文名", "本名"})  # table.py:705

BASIC_INFO_CLASS = "basic-info cmn-clearfix"
# file/configuration/urlTableMap/baike.baidu.com.json

LIST_TABLE_TITLE_CLASS = "normal title-td"  # tableExtractor.py:345

SERIAL_HEADERS = frozenset({"序号", "序"})      # table.py:1022 clearSet
REFERENCE_ROW_MARK = "参考资料"                  # table.py:1042
DEFAULT_CAPTION = "未命名表格"                   # table.py:87, tableExtractor.py:459

# --- T12: POS-weight lexicon (WordMap) ---------------------------------------
#
# The reference's orientation tie-break (getUnfoldDirection table.py:347-354)
# sums, per cell, an integer weight per HanLP POS tag of the cell's tokens
# (TableItem.getTableItemWordType, TableItem.py:98-117). The weights come
# from file/configuration/other/WordMap.pkl — decoded, it is simply the
# alphabetical index (1-based) of each of the 148 HanLP nature tags. Pinned
# here as data (it is configuration, not code).
WORD_MAP: dict[str, int] = {
    "a": 1, "ad": 2, "ag": 3, "al": 4, "an": 5, "b": 6, "begin": 7, "bg": 8,
    "bl": 9, "c": 10, "cc": 11, "d": 12, "dg": 13, "dl": 14, "e": 15,
    "end": 16, "f": 17, "g": 18, "gb": 19, "gbc": 20, "gc": 21, "gg": 22,
    "gi": 23, "gm": 24, "gp": 25, "h": 26, "i": 27, "j": 28, "k": 29,
    "l": 30, "m": 31, "mg": 32, "Mg": 33, "mq": 34, "n": 35, "nb": 36,
    "nba": 37, "nbc": 38, "nbp": 39, "nf": 40, "ng": 41, "nh": 42,
    "nhd": 43, "nhm": 44, "ni": 45, "nic": 46, "nis": 47, "nit": 48,
    "nl": 49, "nm": 50, "nmc": 51, "nn": 52, "nnd": 53, "nnt": 54,
    "nr": 55, "nr1": 56, "nr2": 57, "nrf": 58, "nrj": 59, "ns": 60,
    "nsf": 61, "nt": 62, "ntc": 63, "ntcb": 64, "ntcf": 65, "ntch": 66,
    "nth": 67, "nto": 68, "nts": 69, "ntu": 70, "nx": 71, "nz": 72,
    "o": 73, "p": 74, "pba": 75, "pbei": 76, "q": 77, "qg": 78, "qt": 79,
    "qv": 80, "r": 81, "rg": 82, "Rg": 83, "rr": 84, "ry": 85, "rys": 86,
    "ryt": 87, "ryv": 88, "rz": 89, "rzs": 90, "rzt": 91, "rzv": 92,
    "s": 93, "t": 94, "tg": 95, "u": 96, "ud": 97, "ude1": 98, "ude2": 99,
    "ude3": 100, "udeng": 101, "udh": 102, "ug": 103, "uguo": 104,
    "uj": 105, "ul": 106, "ule": 107, "ulian": 108, "uls": 109,
    "usuo": 110, "uv": 111, "uyy": 112, "uz": 113, "uzhe": 114,
    "uzhi": 115, "v": 116, "vd": 117, "vf": 118, "vg": 119, "vi": 120,
    "vl": 121, "vn": 122, "vshi": 123, "vx": 124, "vyou": 125, "w": 126,
    "wb": 127, "wd": 128, "wf": 129, "wh": 130, "wj": 131, "wky": 132,
    "wkz": 133, "wm": 134, "wn": 135, "wp": 136, "ws": 137, "wt": 138,
    "ww": 139, "wyy": 140, "wyz": 141, "x": 142, "xu": 143, "xx": 144,
    "y": 145, "yg": 146, "z": 147, "zg": 148,
}

# Deterministic HanLP-segmentation proxy for CJK FUNCTION characters: the
# unambiguous single-character particles/copulas HanLP tags with a dedicated
# nature. Everything else CJK defaults to "n" (common noun) — HanLP's
# majority tag for Baike table content. Small by design: the tie-break only
# compares VARIANCE of the weight sums across rows vs columns, so only
# systematic per-axis differences matter.
CJK_CHAR_POS: dict[str, str] = {
    "的": "ude1", "地": "ude2", "得": "ude3", "了": "ule", "着": "uzhe",
    "之": "uzhi", "是": "vshi", "有": "vyou", "和": "cc", "与": "cc",
    "或": "c", "在": "p", "把": "pba", "被": "pbei", "等": "udeng",
    "们": "k", "不": "d", "很": "d", "呢": "y", "吗": "y", "吧": "y",
}

# --- TypeTree ---------------------------------------------------------------

# type name -> parent (root 类型 has parent None); mirrors table.py:1062-1089
_TYPE_PARENT: dict[str, str | None] = {
    "类型": None,
    "超链接": "类型",
    "图片": "类型",
    "字符和数字": "类型",
    "其他类型": "类型",
    "标点类型": "类型",
    "字符类型": "字符和数字",
    "数字类型": "字符和数字",
    "中文": "字符类型",
    "英文": "字符类型",
    "<=0": "数字类型",
    "0-1": "数字类型",
    ">=1": "数字类型",
    "大写": "英文",
    "小写": "英文",
    "大小写混合": "英文",
}

TYPE_NAMES: tuple[str, ...] = tuple(_TYPE_PARENT)
TYPE_INDEX: dict[str, int] = {name: i for i, name in enumerate(TYPE_NAMES)}

# Character-typed cell types for header discrimination
# (__typeDiscriminatePropertyLineNum, table.py:511). NOTE the reference set
# includes "英文" which its classifier never emits (it always refines English
# into 大写/小写/大小写混合); we keep the full set for parity.
CHARACTER_TYPES = frozenset({"字符类型", "中文", "英文", "大写", "小写", "大小写混合"})
CHARACTER_TYPE_IDS = frozenset(TYPE_INDEX[t] for t in CHARACTER_TYPES)

PUNCT_TYPE_ID = TYPE_INDEX["标点类型"]


def _depth(name: str) -> int:
    d = 0
    while _TYPE_PARENT[name] is not None:
        name = _TYPE_PARENT[name]  # type: ignore[assignment]
        d += 1
    return d


def _pair_distance(a: str, b: str) -> int:
    """Tree distance per _VType (table.py:1128-1159): walk the deeper node
    up to the shallower's level (+1 per step), then both up together
    (+2 per step) until they meet."""
    if a == b:
        return 0
    da, db = _depth(a), _depth(b)
    dist = 0
    while da > db:
        a = _TYPE_PARENT[a]  # type: ignore[assignment]
        da -= 1
        dist += 1
    while db > da:
        b = _TYPE_PARENT[b]  # type: ignore[assignment]
        db -= 1
        dist += 1
    while a != b:
        a = _TYPE_PARENT[a]  # type: ignore[assignment]
        b = _TYPE_PARENT[b]  # type: ignore[assignment]
        dist += 2
    return dist


def build_type_distance_matrix() -> np.ndarray:
    n = len(TYPE_NAMES)
    m = np.zeros((n, n), dtype=np.int16)
    for i, a in enumerate(TYPE_NAMES):
        for j, b in enumerate(TYPE_NAMES):
            m[i, j] = _pair_distance(a, b)
    return m


TYPE_DISTANCE: np.ndarray = build_type_distance_matrix()
