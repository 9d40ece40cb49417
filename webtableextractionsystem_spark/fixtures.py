"""HTML fixture archetypes H1-H12 (FIXTURES.md §4).

Shared between unit tests and the deterministic synthetic-document
generator (datagen.py). Each archetype mirrors a structure the reference
extracts from Baidu-Baike pages; goldens for them are pinned in
tests/test_pipeline_goldens.py.
"""

from __future__ import annotations

# H1: basic-info <dl> block -> T3 + person-info + entity property bag
H1_BASIC_INFO = """
<div class="basic-info cmn-clearfix">
  <dl><dt>中文名</dt><dd>李明</dd></dl>
  <dl><dt>国籍</dt><dd>中国</dd></dl>
  <dl><dt>出生日期</dt><dd>1970年1月1日</dd></dl>
  <dl><dt>职业</dt><dd>教师<br/>作家</dd></dl>
</div>
"""

# H2: ROW-direction relation table with <th> header, links, one rowspan
H2_RELATION_TABLE = """
<table>
  <tr><th>姓名</th><th>关系</th><th>备注</th></tr>
  <tr><td rowspan="2"><a href="/item/%E7%8E%8B%E8%8A%B3">王芳</a></td><td>妻子</td><td>结婚[1]</td></tr>
  <tr><td>朋友</td><td>同学\xa0</td></tr>
  <tr><td><a href="/item/%E5%BC%A0%E4%B8%89">张三</a></td><td>兄弟</td><td>无</td></tr>
</table>
"""

# H3: COL-direction 2-col person table (properties down first column)
H3_COL_PERSON = """
<table>
  <tr><th>中文名</th><td>赵云</td></tr>
  <tr><th>国籍</th><td>蜀汉</td></tr>
  <tr><th>职业</th><td>将军</td></tr>
</table>
"""

# H4: caption table 家族成员 with a person column
H4_CAPTION_TABLE = """
<table>
  <caption>家族成员</caption>
  <tr><th>姓名</th><th>备注</th></tr>
  <tr><td><a href="/item/%E6%9D%8E%E5%A4%A7">李大</a></td><td>长子</td></tr>
  <tr><td>李二</td><td>次子</td></tr>
</table>
"""

# H5: layout table to REJECT (link farm: hrefs > 2*rows*cols)
_H5_LINKS = "".join(
    f'<a href="/l{i}">l{i}</a>' for i in range(30)
)
H5_LAYOUT_REJECT = f"""
<table>
  <tr><td>{_H5_LINKS}</td><td>nav</td></tr>
  <tr><td>foot</td><td>bar</td></tr>
</table>
"""

# H6: list table (normal title-td + ul/li/span with ▪ bullets)
H6_LIST_TABLE = """
<table>
  <tr><td class="normal title-td">主要作品</td></tr>
  <tr><td>
    <ul>
      <li><span>▪</span><span>作品甲</span><span>1990</span></li>
      <li><span>▪</span><span>作品乙</span><span>1992</span></li>
    </ul>
  </td></tr>
</table>
"""

# H7: junk features: 序号 col, trailing single-char row, 参考资料 row,
# punctuation-only cell, footnotes, nbsp
H7_JUNK = """
<table>
  <tr><th>序号</th><th>姓名</th><th>关系</th></tr>
  <tr><td>1</td><td>钱一[3]</td><td>亲属\xa0</td></tr>
  <tr><td>2</td><td>孙二</td><td>。。</td></tr>
  <tr><td>参考资料</td><td>参考资料[1]</td><td>参考资料</td></tr>
</table>
"""

# H8: cells with <img> interleaved with text
H8_IMG_CELLS = """
<table>
  <tr><th>姓名</th><th>照片</th></tr>
  <tr><td>周八</td><td><img src="img://p8.jpg"/>肖像</td></tr>
  <tr><td>吴九</td><td><img src="img://w9.jpg"/>肖像</td></tr>
</table>
"""

# H9: boilerplate shell around real content (F4)
H9_BOILERPLATE = """
<!-- header comment -->
<script>var x = 1;</script>
<style>.a { color: red }</style>
<article>ignored article text</article>
<code>ignored code</code>
<div>
<table>
  <tr><th>姓名</th><th>年龄</th></tr>
  <tr><td>郑十</td><td>40</td></tr>
</table>
</div>
<script>var y = 2;</script>
"""

# H10: degenerate tables (1x1, empty, ragged) -> excluded, no crash
H10_DEGENERATE = """
<table><tr><td>单格</td></tr></table>
<table></table>
<table>
  <tr><th>甲</th><th>乙</th><th>丙</th></tr>
  <tr><td>1</td></tr>
  <tr><td>2</td><td>3</td></tr>
</table>
"""

# H12: cell-type battery
H12_TYPE_BATTERY = """
<table>
  <tr><th>名称</th><th>数值</th><th>英文</th><th>链接</th></tr>
  <tr><td>指标甲</td><td>42</td><td>ABC</td><td>http://a.example.com/x</td></tr>
  <tr><td>指标乙</td><td>-3</td><td>abc</td><td>http://b.example.com/y</td></tr>
  <tr><td>指标丙</td><td>0.5</td><td>AbC</td><td>，。</td></tr>
</table>
"""


# H13: WordprocessingML table (S14 second input kind, span kind='docx')
H13_DOCX_TABLE = """
<w:tbl>
  <w:tr><w:tc><w:p><w:r><w:t>家族成员</w:t></w:r></w:p></w:tc></w:tr>
  <w:tr><w:tc><w:t>姓名</w:t></w:tc><w:tc><w:t>关系</w:t></w:tc></w:tr>
  <w:tr><w:tc><w:t>丙某</w:t></w:tc><w:tc><w:t>亲属</w:t></w:tc></w:tr>
  <w:tr><w:tc><w:t>丁某</w:t></w:tc><w:tc><w:t>称谓乙</w:t></w:tc></w:tr>
</w:tbl>
"""


# H14: multi-token caption-relationship header — 儿女 contains BOTH 儿 and
# 女, so the per-(header,token)-pair count (table.py:741-746) reaches 2 of
# 3 headers' worth and classifies this 属性关系表 even though only one
# header matches at all; no relation/person column exists, so extraction
# yields nothing — the TYPE is the pinned behavior.
H14_MULTITOKEN_HEADER = """
<table>
  <tr><th>儿女</th><th>备注甲</th><th>备注乙</th></tr>
  <tr><td>甲娘</td><td>乙娘</td><td>丙娘</td></tr>
</table>
"""

# H15: THREE relation-bearing headers. Ranked deletion looks positions up
# in the STALE pre-deletion header list (table.py:853-856): after 称谓@2
# is deleted, 辈分's stale position 3 exceeds the 3-column table and the
# delete raises -> relation extraction degrades to [] (dispatch guard),
# but entity extraction still runs on the mutated table (姓名 + 关系/辈分
# property bag).
H15_THREE_RELATION_HEADERS = """
<table>
  <tr><th>姓名</th><th>关系</th><th>称谓</th><th>辈分</th></tr>
  <tr><td>甲某</td><td>兄弟</td><td>兄长</td><td>长辈</td></tr>
  <tr><td>乙某</td><td>朋友</td><td>同窗</td><td>平辈</td></tr>
</table>
"""

# H16: stale-position deletion hits a SHIFTED column: order 称谓|关系|辈分|
# 姓名 deletes 称谓@0, then 辈分's stale position 2 removes 姓名 by
# mistake — no person column left, so the table produces nothing at all.
H16_SHIFTED_DELETION = """
<table>
  <tr><th>称谓</th><th>关系</th><th>辈分</th><th>姓名</th></tr>
  <tr><td>兄长</td><td>兄弟</td><td>长辈</td><td>甲某</td></tr>
</table>
"""

# H17: T12 POS-weight orientation tie-break. All cells are 2 chars of the
# same cell type, so length and type characters tie at (0,0); column 1 is
# function words (的了 -> ude1+ule weights) versus noun column 0, so the
# word-type variance tie-break picks COL (table.py:347-354).
H17_POS_TIEBREAK = """
<table>
  <tr><td>名字</td><td>的了</td></tr>
  <tr><td>名字</td><td>的了</td></tr>
</table>
"""


def mega_doc_html(n_tables: int) -> str:
    """H11: mega-doc with n copies of H2 (skew tail)."""
    return "<div>" + H2_RELATION_TABLE * n_tables + "</div>"


ARCHETYPES: dict[str, str] = {
    "H1": H1_BASIC_INFO,
    "H2": H2_RELATION_TABLE,
    "H3": H3_COL_PERSON,
    "H4": H4_CAPTION_TABLE,
    "H5": H5_LAYOUT_REJECT,
    "H6": H6_LIST_TABLE,
    "H7": H7_JUNK,
    "H8": H8_IMG_CELLS,
    "H9": H9_BOILERPLATE,
    "H10": H10_DEGENERATE,
    "H12": H12_TYPE_BATTERY,
    "H14": H14_MULTITOKEN_HEADER,
    "H15": H15_THREE_RELATION_HEADERS,
    "H16": H16_SHIFTED_DELETION,
    "H17": H17_POS_TIEBREAK,
}
