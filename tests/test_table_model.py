"""Unit tests for table-structure operators T5-T16 (SURVEY.md §2.3) +
property-based invariants (§5.4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from webtableextractionsystem_spark.kernel.table_model import (
    Cell,
    Table,
    cell_word_type,
    clear_table,
    discriminate_header_lines,
    length_character,
    normalize_grid,
    tag_header_lines,
    type_character,
    type_header_lines,
    unfold_direction,
    word_type_character,
)
from webtableextractionsystem_spark.lexicons import TYPE_INDEX, WORD_MAP


def cell(content="x", rowspan=1, colspan=1, tag="td", type_name=None):
    c = Cell(str(content), rowspan, colspan, tag=tag)
    if type_name:
        c.type_idx = TYPE_INDEX[type_name]
    return c


def grid_contents(grid):
    return [[c.content for c in row] for row in grid]


# -- T5/T6: span normalization ---------------------------------------------

def test_normalize_plain():
    rows = [[cell("a"), cell("b")], [cell("c"), cell("d")]]
    grid, correct = normalize_grid(rows)
    assert correct
    assert grid_contents(grid) == [["a", "b"], ["c", "d"]]


def test_normalize_rowspan_first_col():
    rows = [
        [cell("A", rowspan=2), cell("b"), cell("c")],
        [cell("d"), cell("e")],
    ]
    grid, correct = normalize_grid(rows)
    assert correct
    assert grid_contents(grid) == [["A", "b", "c"], ["A", "d", "e"]]


def test_normalize_rowspan_middle_col():
    # the reference's getAbsolutePosition mis-places this layout
    # (table.py:360-385); we pin the standard occupancy-grid semantics
    rows = [
        [cell("a"), cell("B", rowspan=2), cell("c")],
        [cell("d"), cell("e")],
    ]
    grid, correct = normalize_grid(rows)
    assert correct
    assert grid_contents(grid) == [["a", "B", "c"], ["d", "B", "e"]]


def test_normalize_colspan():
    rows = [
        [cell("H", colspan=3)],
        [cell("a"), cell("b"), cell("c")],
    ]
    grid, correct = normalize_grid(rows)
    assert correct
    assert grid_contents(grid) == [["H", "H", "H"], ["a", "b", "c"]]


def test_normalize_ragged_incorrect():
    rows = [[cell("a"), cell("b"), cell("c")], [cell("d")]]
    grid, correct = normalize_grid(rows)
    assert not correct
    assert len(grid[0]) == len(grid[1]) == 3  # padded for numpy safety


def test_normalize_rowspan_overflow_clamped():
    rows = [[cell("a", rowspan=9), cell("b")], [cell("c")]]
    grid, correct = normalize_grid(rows)
    assert correct
    assert grid_contents(grid) == [["a", "b"], ["a", "c"]]


# -- T9-T11: orientation ----------------------------------------------------

def make_table(rows, **kw):
    grid, correct = normalize_grid(rows)
    return Table(grid, caption="未命名表格", correct=correct, **kw)


def test_direction_tag_vote_row():
    t = make_table([
        [cell("姓名", tag="th", type_name="中文"), cell("年龄", tag="th", type_name="中文")],
        [cell("甲", type_name="中文"), cell("1", type_name=">=1")],
    ])
    assert unfold_direction(t) == "ROW"


def test_direction_tag_vote_col():
    t = make_table([
        [cell("姓名", tag="th", type_name="中文"), cell("甲", type_name="中文")],
        [cell("年龄", tag="th", type_name="中文"), cell("1", type_name=">=1")],
    ])
    assert unfold_direction(t) == "COL"


def test_direction_variance_col_for_homogeneous_columns():
    # no <th>: score-based. Column 0 = short Chinese labels, column 1 =
    # numbers; within-row variation high -> Row score high -> COL
    # (mechanical reference semantics, table.py:337-358)
    t = make_table([
        [cell("名", type_name="中文"), cell("1990", type_name=">=1")],
        [cell("次", type_name="中文"), cell("1992", type_name=">=1")],
    ])
    assert unfold_direction(t) == "COL"


def test_length_character_normalization():
    lengths = np.array([[1, 4], [1, 4]])
    row_n, col_n = length_character(lengths)
    # per-row std = 1.5 each -> row=1.5; per-col std = 0 -> col=0
    assert (row_n, col_n) == (1.0, 0.0)
    assert length_character(np.array([[2, 2], [2, 2]])) == (0.0, 0.0)


def test_type_character_uniform_is_zero():
    types = np.full((3, 3), TYPE_INDEX["中文"], dtype=np.int16)
    assert type_character(types) == (0.0, 0.0)


# -- T12: POS-weight tie-break (table.py:347-354, TableItem.py:98-117) -------

def test_cell_word_type_proxy_weights():
    # digit run = one 'm' token, ASCII run = one 'nx' token
    assert cell_word_type("abc123") == WORD_MAP["nx"] + WORD_MAP["m"]
    # CJK function characters hit the static lexicon; other CJK default 'n'
    assert cell_word_type("的") == WORD_MAP["ude1"]
    assert cell_word_type("名字") == 2 * WORD_MAP["n"]
    # non-CJK punctuation (。 is U+3002, outside the unified block) -> 'w'
    assert cell_word_type("。") == WORD_MAP["w"]
    # whitespace skipped
    assert cell_word_type(" a  b ") == 2 * WORD_MAP["nx"]
    assert cell_word_type("") == 0


def test_word_type_character_normalization():
    wt = np.array([[70, 205], [70, 205]])
    assert word_type_character(wt) == (1.0, 0.0)
    assert word_type_character(np.array([[5, 5], [5, 5]])) == (0.0, 0.0)


def test_direction_pos_tiebreak_col():
    """Golden tie fixture: all cells same length (2) and same cell type, so
    the length and type characters are both (0,0) and Row == Col exactly —
    the POS tie-break fires (table.py:347-354). Column 1 is function words
    (的了: ude1+ule = 98+107), column 0 is nouns; the within-row word-type
    variance dominates, so rowWordTypeVarianceMean > col -> COL. The
    reference's HanLP weighting agrees: 名字 -> n(35), 的了 -> ude1+ule(205);
    row-std > 0, col-std = 0 -> COL either way."""
    t = make_table([
        [cell("名字", type_name="中文"), cell("的了", type_name="中文")],
        [cell("名字", type_name="中文"), cell("的了", type_name="中文")],
    ])
    assert unfold_direction(t) == "COL"


def test_direction_pos_tiebreak_row_when_transposed():
    t = make_table([
        [cell("名字", type_name="中文"), cell("名字", type_name="中文")],
        [cell("的了", type_name="中文"), cell("的了", type_name="中文")],
    ])
    assert unfold_direction(t) == "ROW"


def test_direction_double_tie_defaults_row():
    # identical cells everywhere: length, type AND word-type characters all
    # tie -> the reference's final fallback "ROW" (table.py:354)
    t = make_table([
        [cell("名字", type_name="中文"), cell("名字", type_name="中文")],
        [cell("名字", type_name="中文"), cell("名字", type_name="中文")],
    ])
    assert unfold_direction(t) == "ROW"


# -- T14-T16: header discriminators (standalone ops; pipeline pins 1) ------

def header_table(th_rows):
    rows = []
    for r in range(3):
        tag = "th" if r < th_rows else "td"
        rows.append([cell(f"h{r}", tag=tag, type_name="中文"),
                     cell(str(r), tag=tag, type_name=">=1" if r >= th_rows else "中文")])
    return make_table(rows)


def test_tag_header_lines():
    assert tag_header_lines(header_table(1), "ROW") == 1
    assert tag_header_lines(header_table(2), "ROW") == 2
    assert tag_header_lines(header_table(0), "ROW") == 0


def test_type_header_lines_all_rows_returns_zero():
    t = make_table([
        [cell("甲", type_name="中文"), cell("乙", type_name="中文")],
        [cell("丙", type_name="中文"), cell("丁", type_name="中文")],
    ])
    assert type_header_lines(t, "ROW") == 0  # consumed all rows -> 0


def test_discriminate_floor_one():
    assert discriminate_header_lines(header_table(0), "ROW") == 1


# -- F8: clearTable ---------------------------------------------------------

def test_clear_table_serial_column():
    t = make_table([
        [cell("序号", type_name="中文"), cell("姓名", type_name="中文")],
        [cell("1", type_name=">=1"), cell("甲乙", type_name="中文")],
    ], direction="ROW")
    clear_table(t)
    assert grid_contents(t.grid) == [["姓名"], ["甲乙"]]


def test_clear_table_single_char_last_row():
    # reference counts len==1 cells as "empty" (table.py:1033)
    t = make_table([
        [cell("姓名", type_name="中文"), cell("备注", type_name="中文")],
        [cell("甲甲", type_name="中文"), cell("乙乙", type_name="中文")],
        [cell("a", type_name="小写"), cell(" ", type_name="标点类型")],
    ], direction="ROW")
    clear_table(t)
    assert len(t.grid) == 2


# -- property-based invariants (SURVEY.md §5.4) -----------------------------

@settings(max_examples=60, deadline=None)
@given(
    rows=st.integers(2, 5), cols=st.integers(2, 5),
    data=st.data(),
)
def test_flip_involution_and_normalize_rectangular(rows, cols, data):
    contents = [
        [data.draw(st.text(alphabet="ab中1。", max_size=4)) for _ in range(cols)]
        for _ in range(rows)
    ]
    raw = [[cell(v, type_name="中文") for v in r] for r in contents]
    grid, correct = normalize_grid(raw)
    assert correct
    assert all(len(r) == cols for r in grid)
    t = Table(grid, caption="x", direction="ROW", correct=correct)
    flipped = t.flip()
    assert flipped.direction == "COL"
    back = flipped.flip()
    assert grid_contents(back.grid) == grid_contents(t.grid)
    assert back.direction == "ROW"


@settings(max_examples=60, deadline=None)
@given(rows=st.integers(2, 5), cols=st.integers(2, 5), data=st.data())
def test_orientation_of_transpose_is_opposite(rows, cols, data):
    """When the variance rule decides strictly (no tie, no th tags), a
    table and its transpose must get opposite directions — the score
    components swap exactly (SURVEY §5.4)."""
    contents = [
        [data.draw(st.text(alphabet="abc中文123", min_size=0, max_size=6))
         for _ in range(cols)]
        for _ in range(rows)
    ]
    import numpy as np
    from webtableextractionsystem_spark.kernel.celltype import classify_batch

    def build(mat):
        raw = [[cell(v) for v in r] for r in mat]
        flat = [c for r in raw for c in r]
        types = classify_batch([c.content for c in flat],
                               [False] * len(flat))
        for c, t in zip(flat, types):
            c.type_idx = int(t)
        grid, correct = normalize_grid(raw)
        return Table(grid, caption="x", correct=correct)

    t = build(contents)
    tt = build([list(r) for r in zip(*contents)])
    row_var, col_var = length_character(t.length_matrix())
    row_t, col_t = type_character(t.type_matrix())
    row_score = 0.5 * row_var + 0.5 * row_t
    col_score = 0.5 * col_var + 0.5 * col_t
    if abs(row_score - col_score) > 1e-9:  # strict decision only
        assert unfold_direction(t) != unfold_direction(tt)


@settings(max_examples=40, deadline=None)
@given(
    rows=st.integers(2, 4), cols=st.integers(2, 4),
    rs=st.integers(1, 3), cs=st.integers(1, 3),
)
def test_normalize_with_spans_is_rectangular(rows, cols, rs, cs):
    raw = []
    for r in range(rows):
        row = [cell(f"{r}-{c}") for c in range(cols)]
        raw.append(row)
    raw[0][0].rowspan = rs
    raw[0][0].colspan = cs
    grid, _ = normalize_grid(raw)
    widths = {len(r) for r in grid}
    assert len(widths) == 1
