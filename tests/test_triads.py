"""Triad-mode entity extraction (extractEntity(getEntityTriad=True),
table.py:933-943 — dead code in the reference pipeline, provided for
operator-surface completeness)."""

from webtableextractionsystem_spark.kernel.extract import extract_entity_triads
from webtableextractionsystem_spark.kernel.table_model import Cell, Table, normalize_grid
from webtableextractionsystem_spark.lexicons import TYPE_INDEX


def cell(content, tag="td"):
    c = Cell(str(content), 1, 1, tag=tag)
    c.type_idx = TYPE_INDEX["中文"]
    return c


def make(rows):
    grid, correct = normalize_grid([[cell(v) for v in r] for r in rows])
    return Table(grid, caption="未命名表格", direction="ROW", correct=correct)


def test_triads_basic():
    t = make([
        ["姓名", "职业", "备注"],
        ["甲某", "教师", "备注一(x)"],
        ["乙某", "医生", "  "],       # whitespace value skipped pre-clean
    ])
    got = extract_entity_triads(t)
    assert got == [
        ("甲某", "职业", "教师"),
        ("甲某", "备注", "备注一"),   # brackets cleaned from all three (table.py:70-71)
        ("乙某", "职业", "医生"),
    ]
    # person column was deleted from the table (reference mutation)
    assert t.headers() == ["职业", "备注"]


def test_triads_bracket_cleaning_in_c_only_when_name():
    t = make([
        ["姓名", "配偶名"],
        ["甲某", "乙某（注）"],
    ])
    # c is not flagged as a name here -> brackets removed (RE_BRACKETS
    # applies to all three), punctuation kept
    got = extract_entity_triads(t)
    assert got == [("甲某", "配偶名", "乙某")]


def test_triads_no_person_column():
    t = make([["甲", "乙"], ["丙", "丁"]])
    assert extract_entity_triads(t) == []


def test_triads_long_subject_rejected():
    t = make([
        ["姓名", "职业"],
        ["很长很长很长很长的名字", "教师"],
    ])
    assert extract_entity_triads(t) == []
