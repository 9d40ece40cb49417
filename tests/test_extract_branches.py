"""Targeted tests for extraction branches not covered by the archetype
goldens: the caption-relation header fallback (table.py:879-896) and
property-relation ranked multi-column deletion (table.py:853-856)."""

from webtableextractionsystem_spark.kernel.extract import (
    extract_caption_relationships,
    extract_property_relationships,
    table_type,
)
from webtableextractionsystem_spark.kernel.table_model import Cell, Table, normalize_grid
from webtableextractionsystem_spark.lexicons import TYPE_INDEX


def cell(content, href=None):
    c = Cell(str(content), 1, 1, href=href or {})
    c.type_idx = TYPE_INDEX["中文"]
    return c


def make(rows, caption="未命名表格", prefix="主人公", href_map=None):
    grid, correct = normalize_grid(rows)
    t = Table(grid, caption=caption, prefix=prefix, direction="ROW",
              href_map=href_map or {}, correct=correct)
    return t


def test_caption_relation_header_fallback():
    """The fallback (>half headers carry caption-rel tokens, no person
    column; table.py:879-896) is DEAD CODE via the dispatch: the same
    count condition classifies the table as 属性关系表 earlier in the
    cascade (table.py:739-748), so getTableType never routes here. Pinned
    by direct invocation, like the reference's own structure."""
    t = make(
        [
            [cell("长女"), cell("次女"), cell("三女")],
            [cell("甲娘", {"甲娘": "u1"}), cell("乙娘"), cell("丙娘")],
        ],
        caption="家族成员",
    )
    # cascade order: the identical header-count test fires first
    assert table_type(t) == "property_rel"
    got = extract_caption_relationships(t)
    assert got == [
        ("主人公", "", "长女", "甲娘", "u1"),
        ("主人公", "", "次女", "乙娘", ""),
        ("主人公", "", "三女", "丙娘", ""),
    ]


def test_caption_relation_no_fallback_when_headers_not_relational():
    t = make(
        [
            [cell("栏目甲"), cell("栏目乙")],
            [cell("甲娘"), cell("乙娘")],
        ],
        caption="家族成员",
    )
    assert extract_caption_relationships(t) == []


def test_property_relation_ranked_column_deletion():
    """Two relation-bearing headers: 关系 (rank 0) wins; the 辈分 (rank 2)
    column is deleted BEFORE extraction, mirroring the reference's
    ranked-deletion mutation order."""
    t = make([
        [cell("姓名"), cell("关系"), cell("辈分")],
        [cell("甲某"), cell("兄弟"), cell("长辈")],
        [cell("乙某"), cell("朋友"), cell("平辈")],
    ])
    assert table_type(t) == "property_rel"
    got = extract_property_relationships(t)
    assert [(s, r, o) for s, _, r, o, _ in got] == [
        ("主人公", "兄弟", "甲某"),
        ("主人公", "朋友", "乙某"),
    ]
    # both the 辈分 column and the 关系 column were deleted
    assert t.headers() == ["姓名"]


def test_property_relation_three_headers_stale_position_raises():
    """3 relation-bearing headers: the reference looks positions up in the
    STALE pre-deletion header list (table.py:853-856). Deletion order is
    lexicon rank (关系 kept, then 称谓, then 辈分); after 称谓@2 is removed
    the stale position of 辈分 (3) exceeds the 3-column table and
    deleteOneCol raises — reproduced as TableError."""
    t = make([
        [cell("姓名"), cell("关系"), cell("称谓"), cell("辈分")],
        [cell("甲某"), cell("兄弟"), cell("兄长"), cell("长辈")],
    ])
    import pytest

    from webtableextractionsystem_spark.kernel.table_model import TableError

    with pytest.raises(TableError):
        extract_property_relationships(t)
    # the first ranked deletion landed before the raise
    assert t.headers() == ["姓名", "关系", "辈分"]


def test_property_relation_stale_position_deletes_shifted_column():
    """Column order 称谓|关系|辈分|姓名: deleting 称谓@0 shifts everything
    left, so 辈分's stale position 2 now points at 姓名 — the reference
    deletes the person column by mistake and extraction yields nothing
    (no person column left to resolve hrefs from)."""
    t = make([
        [cell("称谓"), cell("关系"), cell("辈分"), cell("姓名")],
        [cell("兄长"), cell("兄弟"), cell("长辈"), cell("甲某")],
    ])
    got = extract_property_relationships(t)
    assert got == []
    # 称谓 deleted, then stale pos 2 removed 姓名, then the 关系 column
    assert t.headers() == ["辈分"]


def test_caption_count_is_per_header_token_pair():
    """儿女 contains BOTH 儿 and 女, so the reference's count loop
    (table.py:741-746) adds 2 for that single header; 2 > 3/2 classifies
    this as 属性关系表 even though only 1 of 3 headers matches at all."""
    t = make(
        [
            [cell("儿女"), cell("备注甲"), cell("备注乙")],
            [cell("甲娘", {"甲娘": "u1"}), cell("乙娘"), cell("丙娘")],
        ],
        caption="家族成员",
    )
    assert table_type(t) == "property_rel"
    # same pair-counting drives the caption-rel header fallback
    got = extract_caption_relationships(t)
    assert got == [
        ("主人公", "", "儿女", "甲娘", "u1"),
        ("主人公", "", "备注甲", "乙娘", ""),
        ("主人公", "", "备注乙", "丙娘", ""),
    ]


def test_property_relation_prefix_href_resolution():
    t = make(
        [
            [cell("姓名"), cell("关系")],
            [cell("甲某"), cell("兄弟")],
        ],
        href_map={"主人公": "doc://p"},
    )
    got = extract_property_relationships(t)
    assert got == [("主人公", "doc://p", "兄弟", "甲某", "")]


def test_property_relation_requires_prefix():
    t = make([
        [cell("姓名"), cell("关系")],
        [cell("甲某"), cell("兄弟")],
    ])
    t.prefix = ""
    assert extract_property_relationships(t) == []
