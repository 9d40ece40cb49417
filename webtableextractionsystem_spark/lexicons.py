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
