"""Table model + structure operators (SURVEY.md §2.3, T1-T18).

Pinned re-specification of the reference's Table class
(/root/reference/src/tableExtract/table.py). Documented deviations from
the reference, chosen where the reference behavior is a plain bug and our
fixtures pin the corrected semantics:

* **Absolute positions / span normalization** (getAbsolutePosition
  table.py:360-385 + extendTable :121-152): the reference's pending-span
  bookkeeping mis-places cells when a rowspan starts in a non-first
  column. We implement the standard HTML occupancy-grid algorithm, which
  agrees with the reference on the layouts it handles correctly
  (rowspans in the first column, colspans anywhere).
* **Orientation** (getUnfoldDirection table.py:313-358): the aspect-ratio
  rule at :331-335 stores into ``unfoldDirection`` but is unconditionally
  overwritten at :357 — a dead store; we omit it to match the effective
  behavior. The POS tie-break at :347-354 IS implemented (cell_word_type /
  word_type_character below) with the reference's WordMap.pkl weights; the
  HanLP segmenter, unavailable here, is replaced by a documented
  deterministic character-class proxy (see cell_word_type).
* **Header line count** (discriminatePropertyLineNum table.py:535-549):
  ``propertyLineNum`` is initialized to 1 (:112) so the discriminator
  short-circuits at :541 and ALWAYS returns 1 in the reference pipeline.
  The pipeline pins ``header_rows = 1``; the tag/type discriminators are
  still provided (and unit-tested) as standalone operators.
"""

from __future__ import annotations

import numpy as np

from ..lexicons import (
    CJK_CHAR_POS,
    PUNCT_TYPE_ID,
    REFERENCE_ROW_MARK,
    SERIAL_HEADERS,
    TYPE_DISTANCE,
    TYPE_NAMES,
    CHARACTER_TYPE_IDS,
    WORD_MAP,
)


class TableError(Exception):
    """Raised when a structural op hits an invalid table (reference raises
    bare Exception from deleteOneRow/getRowAt; callers drop the table)."""


class Cell:
    __slots__ = (
        "content", "rowspan", "colspan", "abs_row", "abs_col",
        "href", "img", "tag", "type_idx",
    )

    def __init__(self, content: str = "", rowspan: int = 1, colspan: int = 1,
                 href: dict | None = None, img: list | None = None,
                 tag: str = "td"):
        self.content = content
        self.rowspan = rowspan
        self.colspan = colspan
        self.abs_row = -1
        self.abs_col = -1
        self.href = href if href is not None else {}
        self.img = img if img is not None else []
        self.tag = tag
        self.type_idx = -1  # assigned by the batched classifier

    def copy_at(self, r: int, c: int) -> "Cell":
        dup = Cell(self.content, 1, 1, self.href, self.img, self.tag)
        dup.abs_row, dup.abs_col = r, c
        dup.type_idx = self.type_idx
        return dup

    @property
    def type_name(self) -> str:
        return TYPE_NAMES[self.type_idx] if self.type_idx >= 0 else ""


class Table:
    """Normalized rectangular table (post cell-span expansion)."""

    def __init__(self, grid: list[list[Cell]], caption: str, prefix: str = "",
                 direction: str | None = None, table_type: str | None = None,
                 href_map: dict | None = None, source_offset: int = 0,
                 correct: bool = True):
        self.grid = grid
        self.caption = caption
        self.prefix = prefix
        self.direction = direction          # pre-set or detected; None = unknown
        self.table_type = table_type        # pre-set (basic-info) or classified
        self.href_map = href_map if href_map is not None else {}
        self.source_offset = source_offset
        self.header_rows = 1                # reference-effective constant
        # __isNormal/__isCorrect are FROZEN at construction in the reference
        # (initialNormal/initialCorrect run at extend/flip time only;
        # deleteOneRow/deleteOneCol never refresh them, table.py:168-199),
        # so post-deletion code sees stale True — e.g. entity extraction on
        # a column-depleted table yields empty-prop entities instead of
        # failing. We reproduce that by freezing both flags here.
        self._correct = correct
        self._normal = len(grid) >= 2 and (len(grid[0]) if grid else 0) >= 2

    # -- shape -------------------------------------------------------------

    @property
    def n_rows(self) -> int:
        return len(self.grid)

    @property
    def n_cols(self) -> int:
        return len(self.grid[0]) if self.grid else 0

    def is_normal(self) -> bool:
        """Frozen initialNormal flag (see __init__ note)."""
        return self._normal

    def is_correct(self) -> bool:
        return self._correct

    def row(self, i: int) -> list[Cell]:
        if not self.grid or not (0 <= i < self.n_rows):
            raise TableError(f"row {i} out of range")
        return self.grid[i]

    def col(self, j: int) -> list[Cell]:
        if not (0 <= j < self.n_cols):
            raise TableError(f"col {j} out of range")
        return [r[j] for r in self.grid]

    def headers(self) -> list[str]:
        """Property-name list: header row contents (propertyLineNum == 1 ->
        row 0; getPropertyList table.py:387-404)."""
        return [str(c.content) for c in self.row(self.header_rows - 1)]

    # -- structural ops ----------------------------------------------------

    def flip(self) -> "Table":
        """Transpose (table.py:201-224); direction swaps ROW<->COL."""
        grid = [[self.grid[i][j] for i in range(self.n_rows)]
                for j in range(self.n_cols)]
        new_dir = {"ROW": "COL", "COL": "ROW"}.get(self.direction or "", None)
        t = Table(grid, self.caption, self.prefix, new_dir, self.table_type,
                  self.href_map, self.source_offset, self._correct)
        return t

    def delete_row(self, i: int) -> None:
        """deleteOneRow (table.py:168-182): frozen-flag gate + bounds."""
        if not (self._normal and self._correct):
            raise TableError("table not normal/correct; cannot delete row")
        if not (0 <= i < self.n_rows):
            raise TableError(f"row {i} out of range")
        del self.grid[i]

    def delete_col(self, j: int) -> None:
        """deleteOneCol (table.py:184-199): frozen-flag gate + bounds."""
        if not (self._normal and self._correct):
            raise TableError("table not normal/correct; cannot delete col")
        if not (0 <= j < self.n_cols):
            raise TableError(f"col {j} out of range")
        for r in self.grid:
            del r[j]

    # -- feature matrices --------------------------------------------------

    def type_matrix(self) -> np.ndarray:
        return np.array([[c.type_idx for c in r] for r in self.grid],
                        dtype=np.int16)

    def length_matrix(self) -> np.ndarray:
        return np.array([[len(str(c.content)) for c in r] for r in self.grid],
                        dtype=np.int64)

    def word_type_matrix(self) -> np.ndarray:
        """T12 feature matrix (initialTableItemWordType, table.py:265-273);
        computed lazily — only the exact-tie path of unfold_direction
        consumes it."""
        return np.array(
            [[cell_word_type(str(c.content)) for c in r] for r in self.grid],
            dtype=np.int64)


# ---------------------------------------------------------------------------
# T5/T6: occupancy-grid span normalization
# ---------------------------------------------------------------------------

def normalize_grid(rows: list[list[Cell]]) -> tuple[list[list[Cell]], bool]:
    """Expand rowspan/colspan into a rectangular grid of 1x1 cells.

    Standard HTML table algorithm: a cursor per row skips slots claimed by
    earlier spans; each cell claims a rowspan x colspan rectangle filled
    with copies. Returns (grid, correct) where correct mirrors
    initialCorrect (table.py:569-581): every row ends up with the same
    width and no slot is claimed twice / left empty.
    """
    if not rows:
        return [], False
    # fast path: rectangular, span-free tables (the common case) need no
    # occupancy bookkeeping or cell copies — assign positions in place
    width0 = len(rows[0])
    if width0 and all(
        len(r) == width0
        and all(c.rowspan == 1 and c.colspan == 1 for c in r)
        for r in rows
    ):
        for i, r in enumerate(rows):
            for j, c in enumerate(r):
                c.abs_row = i
                c.abs_col = j
        return rows, True
    n_rows = len(rows)
    # width = max over rows of (claimed-by-spans + own colspans); grow lazily
    grid: list[list[Cell | None]] = [[] for _ in range(n_rows)]

    def ensure(r: int, c: int) -> None:
        row = grid[r]
        while len(row) <= c:
            row.append(None)

    for r, row_cells in enumerate(rows):
        cursor = 0
        for cell in row_cells:
            ensure(r, cursor)
            while cursor < len(grid[r]) and grid[r][cursor] is not None:
                cursor += 1
            rs = max(1, cell.rowspan)
            cs = max(1, cell.colspan)
            rs = min(rs, n_rows - r)  # clamp overflow (browsers do the same)
            for rr in range(r, r + rs):
                for cc in range(cursor, cursor + cs):
                    ensure(rr, cc)
                    if grid[rr][cc] is None:
                        grid[rr][cc] = cell.copy_at(rr, cc)
            anchor = grid[r][cursor]
            if anchor is not None and (anchor.abs_row, anchor.abs_col) \
                    == (r, cursor):
                # the anchor copy keeps the (clamped) span extents so the
                # Word sink can restore the merge the reference's
                # writeTable2Doc renders (table.py:637-640); covered
                # copies stay 1x1. Mutation ops (delete_row/col, flip) do
                # NOT refresh these — same stale-attribute semantics as
                # the reference's rowspan/colspan fields; the sink clamps
                # at render time.
                anchor.rowspan, anchor.colspan = rs, cs
            cursor += cs

    width = max((len(r) for r in grid), default=0)
    correct = True
    out: list[list[Cell]] = []
    for r, row in enumerate(grid):
        if len(row) != width or any(c is None for c in row):
            correct = False
        fixed = [
            (c if c is not None else Cell("").copy_at(r, i))
            for i, c in enumerate(row)
        ]
        # pad short rows so downstream numpy ops stay rectangular
        while len(fixed) < width:
            fixed.append(Cell("").copy_at(r, len(fixed)))
        out.append(fixed)
    return out, correct


# ---------------------------------------------------------------------------
# T9-T11: orientation features + decision
# ---------------------------------------------------------------------------

def length_character(lengths: np.ndarray) -> tuple[float, float]:
    """getTableItemLengthCharacter (table.py:236-250): normalized mean of
    per-row std (axis=1) and per-column std (axis=0)."""
    col_var = float(np.mean(np.std(lengths, axis=0)))
    row_var = float(np.mean(np.std(lengths, axis=1)))
    s = row_var + col_var
    if s == 0:
        return row_var, col_var
    return row_var / s, col_var / s


def type_character(types: np.ndarray) -> tuple[float, float]:
    """TypeTree.getTypeCharacter (table.py:1091-1126), vectorized:

    colTypeCharacter = mean over rows i<R-1 of mean_j D[t[i,j], t[R-1,j]]
    rowTypeCharacter = mean over cols j<C-1 of mean_i D[t[i,j], t[i,C-1]]

    (note the crossed naming is the reference's: comparing ROWS feeds the
    COL character and vice versa), then normalized by their sum.
    """
    n_rows, n_cols = types.shape
    col_char = 0.0
    row_char = 0.0
    if n_rows > 1:
        d = TYPE_DISTANCE[types[:-1, :], types[-1:, :]]   # (R-1, C)
        col_char = float(np.mean(np.mean(d, axis=1)))
    if n_cols > 1:
        d = TYPE_DISTANCE[types[:, :-1], types[:, -1:]]   # (R, C-1)
        row_char = float(np.mean(np.mean(d, axis=0)))
    s = row_char + col_char
    if s == 0:
        return row_char, col_char
    return row_char / s, col_char / s


_ASCII_ALPHA = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")


def cell_word_type(content: str) -> int:
    """T12 cell word-type weight: TableItem.getTableItemWordType
    (TableItem.py:98-117) sums ``WordMap[nature]`` over the HanLP
    segmentation of the cell text. HanLP is not available (SURVEY §7), so
    segmentation + tagging use a deterministic character-class proxy:

    * digit runs  -> one token tagged ``m``   (HanLP: numeral)
    * ASCII-letter runs -> one token tagged ``nx`` (HanLP: letter string)
    * CJK characters -> one token EACH, tagged from the static
      CJK_CHAR_POS function-word lexicon, default ``n`` (common noun)
    * whitespace skipped; any other character tagged ``w`` (punctuation)

    The proxy's absolute sums differ from HanLP's (it over-segments CJK
    words), but the tie-break consumes only the normalized row/column
    standard deviations of these sums, where the systematic signal —
    function-word/numeral/letter columns versus noun columns — survives.
    """
    total = 0
    i = 0
    s = str(content)
    n = len(s)
    while i < n:
        ch = s[i]
        if ch.isspace():
            i += 1
        elif "0" <= ch <= "9":
            while i < n and "0" <= s[i] <= "9":
                i += 1
            total += 31                      # WORD_MAP["m"]
        elif ch in _ASCII_ALPHA:
            while i < n and s[i] in _ASCII_ALPHA:
                i += 1
            total += 71                      # WORD_MAP["nx"]
        elif "一" <= ch <= "鿿":
            total += WORD_MAP[CJK_CHAR_POS.get(ch, "n")]
            i += 1
        else:
            total += 126                     # WORD_MAP["w"]
            i += 1
    return total


def word_type_character(word_types: np.ndarray) -> tuple[float, float]:
    """getTableItemWordTypeCharacter (table.py:260-280): normalized mean of
    per-row std (axis=1) and per-column std (axis=0) of the cell word-type
    weights — same normalization shape as length_character."""
    col_var = float(np.mean(np.std(word_types, axis=0)))
    row_var = float(np.mean(np.std(word_types, axis=1)))
    s = row_var + col_var
    if s == 0:
        return row_var, col_var
    return row_var / s, col_var / s


def unfold_direction(table: Table) -> str:
    """getUnfoldDirection (table.py:313-358), effective semantics.

    1. tag vote: first row all-<th> -> ROW; first col all-<th> -> COL.
    2. (aspect rule :331-335 omitted — dead store in the reference)
    3. weighted score 0.5*length-variance + 0.5*type-distance; smaller
       wins; on an EXACT tie the POS-weight tie-break (:347-354) compares
       word-type variance the same way; a second tie -> "ROW" (:354).
    """
    if table.direction:
        return table.direction
    row0 = table.row(0)
    if row0[0].tag == "th" and all(c.tag == "th" for c in row0):
        table.direction = "ROW"
        return "ROW"
    col0 = table.col(0)
    if col0[0].tag == "th" and all(c.tag == "th" for c in col0):
        table.direction = "COL"
        return "COL"

    row_var, col_var = length_character(table.length_matrix())
    row_t, col_t = type_character(table.type_matrix())
    row_score = 0.5 * row_var + 0.5 * row_t
    col_score = 0.5 * col_var + 0.5 * col_t
    if row_score < col_score:
        table.direction = "ROW"
    elif row_score == col_score:
        row_w, col_w = word_type_character(table.word_type_matrix())
        table.direction = "ROW" if row_w <= col_w else "COL"
    else:
        table.direction = "COL"
    return table.direction


# ---------------------------------------------------------------------------
# T14-T16: header-line discriminators (standalone operators; the pipeline
# pins header_rows = 1, see module docstring)
# ---------------------------------------------------------------------------

def tag_header_lines(table: Table, direction: str) -> int:
    """__tagDiscriminatePropertyLineNum (table.py:479-503)."""
    if direction == "ROW":
        lines = table.grid
    elif direction == "COL":
        lines = [table.col(j) for j in range(table.n_cols)]
    else:
        raise TableError(f"bad direction {direction}")
    res = 0
    for line in lines:
        if any(c.tag != "th" for c in line):
            return res
        res += 1
    return res


def type_header_lines(table: Table, direction: str) -> int:
    """__typeDiscriminatePropertyLineNum (table.py:505-533)."""
    if direction == "ROW":
        lines, total = table.grid, table.n_rows
    elif direction == "COL":
        lines, total = [table.col(j) for j in range(table.n_cols)], table.n_cols
    else:
        raise TableError(f"bad direction {direction}")
    res = 0
    for line in lines:
        if any(c.type_idx not in CHARACTER_TYPE_IDS for c in line):
            return res
        res += 1
    return 0 if res == total else res


def discriminate_header_lines(table: Table, direction: str) -> int:
    """discriminatePropertyLineNum as WRITTEN (table.py:535-549): tag-based,
    fall back to type-based when 0 or >2, floor 1. The reference pipeline
    never reaches this logic (propertyLineNum=1 short-circuit)."""
    res = tag_header_lines(table, direction)
    if res == 0 or res > 2:
        res = type_header_lines(table, direction)
        if res == 0:
            res = 1
    return res


# ---------------------------------------------------------------------------
# F8: clearTable (table.py:1015-1053)
# ---------------------------------------------------------------------------

def clear_table(table: Table) -> None:
    """Port of clearTable, bug-compatible:

    * delete the first 序号/序 property column (row if direction COL);
    * delete the LAST row if every cell has len(content)==1 or whitespace
      content (the reference comment says "first row is empty" but the
      code checks rowNumber-1 and counts single-char cells as empty —
      table.py:1031-1038);
    * delete the last row when every cell contains 参考资料;
    * blank punctuation-typed cells.
    """
    headers = table.headers()
    idxs = [i for i, h in enumerate(headers) if h in SERIAL_HEADERS]
    if idxs:
        if (table.direction or "ROW") == "ROW":
            table.delete_col(idxs[0])
        else:
            table.delete_row(idxs[0])

    def last_row_all(pred) -> bool:
        # getRowAt checks the FROZEN normal/correct flags (table.py:288),
        # which deletions never refresh — so a 2-row table that just lost
        # its last row proceeds against row 0 here, like the reference.
        return all(pred(str(c.content)) for c in table.row(table.n_rows - 1))

    if last_row_all(lambda s: len(s) == 1 or s.isspace()):
        table.delete_row(table.n_rows - 1)
    if last_row_all(lambda s: REFERENCE_ROW_MARK in s):
        table.delete_row(table.n_rows - 1)

    for r in table.grid:
        for c in r:
            if c.type_idx == PUNCT_TYPE_ID:
                c.content = ""
