"""Parity against the reference's OWN golden artifacts.

/root/reference/file/tablePkl/*.pkl are pickles of
[tableList, entityAndRelationshipList] written by the reference itself
(tableExtractor.py:449) for three real Baidu-Baike pages (孔子, 瞿颖,
燕明刀). The reference classes can't be imported here (bs4/pyhanlp
missing), so a stub unpickler recovers the raw attribute dicts; the
first table of each page is the basic-info 个人信息表 (n x 2, COL). We
reconstruct its source <dl> block, run OUR pipeline, and assert the
extracted entity matches the reference's pickled entity: same name,
same property bag. URL identity differs by design (the reference keys
pages by crawl URL; the rebuild keys by doc_id -> doc://<doc_id>,
pipeline.py docstring)."""

import glob
import pickle

import pytest

from webtableextractionsystem_spark.kernel.pipeline import extract_document

PKL_GLOB = "/root/reference/file/tablePkl/*.pkl"


class _StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):  # noqa: D102 - stub loader
        return type(
            name,
            (),
            {
                "__init__": lambda self, *a, **k: None,
                "__setstate__": lambda self, st: self.__dict__.update(
                    st if isinstance(st, dict) else {}
                ),
            },
        )


def load_golden(path):
    with open(path, "rb") as f:
        tables, ers = _StubUnpickler(f).load()
    return tables, ers


def first_person_info(tables):
    for t in tables:
        d = t.__dict__
        if d.get("tableType") == "个人信息表" and d.get("colNumber") == 2:
            return d
    return None


def rebuild_basic_info_html(table_dict) -> str:
    rows = table_dict["cell"]
    dls = []
    for row in rows:
        dt = str(row[0].__dict__.get("content"))
        dd = str(row[1].__dict__.get("content"))
        dls.append(f"<dl><dt>{dt}</dt><dd>{dd}</dd></dl>")
    return ('<div class="basic-info cmn-clearfix">' + "".join(dls) + "</div>")


def rebuild_table_html(table_dict) -> str:
    """Reconstruct <table> HTML from a pickled raw Table: th/td tags,
    row/colspans, and <a href> wrapped around the first occurrence of
    each link's anchor text (the parser re-adds the baike prefix)."""
    from webtableextractionsystem_spark.kernel.html_tables import BAIKE_PREFIX

    parts = [f"<table><caption>{table_dict['name']}</caption>"]
    for row in table_dict["cell"]:
        parts.append("<tr>")
        for c in row:
            d = c.__dict__
            tag = d.get("tagName") or "td"
            attrs = ""
            if (d.get("rowspan") or 1) > 1:
                attrs += f' rowspan="{d["rowspan"]}"'
            if (d.get("colspan") or 1) > 1:
                attrs += f' colspan="{d["colspan"]}"'
            content = str(d.get("content") or "")
            for text, url in (d.get("href") or {}).items():
                href = url[len(BAIKE_PREFIX):] if url.startswith(BAIKE_PREFIX) else url
                if text in content:
                    content = content.replace(
                        text, f'<a href="{href}">{text}</a>', 1)
            parts.append(f"<{tag}{attrs}>{content}</{tag}>")
        parts.append("</tr>")
    parts.append("</table>")
    return "".join(parts)


def test_reference_caption_relation_parity_kongzi():
    """The 孔子 page's 七十八贤弟子 table: 79x7 with th header, a 序号
    column, per-cell hrefs. The reference's own pickled output has 78
    caption-relation triples and 78 entities; our pipeline must
    reproduce both sets exactly (subject URL remapped per the doc://
    identity model)."""
    path = glob.glob("/root/reference/file/tablePkl/孔子*.pkl")[0]
    tables, ers = load_golden(path)
    golden_table = tables[1].__dict__
    golden_entities, golden_rels = ers[1]
    assert len(golden_rels) == 78

    html = rebuild_table_html(golden_table)
    res = extract_document(
        "孔子", [{"kind": "html", "text": html, "media_ref": "", "offset": 0}]
    )
    assert res["tables"][0]["table_type"] == "caption_rel"

    got_rels = [(t["subj_name"], t["rel"], t["obj_name"], t["obj_url"])
                for t in res["triples"]]
    want_rels = [(s[0], r, o[0], o[1]) for s, r, o in golden_rels]
    assert got_rels == want_rels
    assert all(t["subj_url"] == "doc://孔子" for t in res["triples"])

    got_ents = [(e["name"], e["url"], e["props"]) for e in res["entities"]]
    want_ents = [(n, u, p) for (n, u), p in golden_entities]
    assert got_ents == want_ents


@pytest.mark.parametrize("path", sorted(glob.glob(PKL_GLOB)))
def test_reference_full_page_replay(path):
    """Replay EVERY pickled table of each golden page (15 tables across
    the 3 pages) through the pipeline as one document and assert the
    concatenated entity and triple lists equal the reference's own
    entityAndRelationshipList (tableExtractor.py:109-135 appends one
    [entities, rels] entry per table that produced output, in table
    order). This includes NEGATIVE parity: tables the reference extracted
    nothing from (孔子's 四科十哲/亲属成员, 瞿颖's award tables) must also
    produce nothing here — which pins orientation, classification, and
    person-column decisions against real-page data, not just synthetic
    fixtures."""
    import os

    tables, ers = load_golden(path)
    page = os.path.basename(path).split("2021")[0]
    parts = []
    for t in tables:
        d = t.__dict__
        if d.get("tableType") == "个人信息表":
            parts.append(rebuild_basic_info_html(d))
        else:
            parts.append(rebuild_table_html(d))
    res = extract_document(
        page,
        [{"kind": "html", "text": "".join(parts), "media_ref": "",
          "offset": 0}],
    )
    assert res["n_errors"] == 0

    # identity model remap: entities resolved to the page's own crawl URL
    # (e.g. 孔子's basic-info entity 孔丘) carry doc://<page> here
    # (pipeline.py docstring). The crawl URL is recoverable from the
    # first golden entity — the basic-info row whose href the reference
    # seeds with hrefMap[nowName] = nowUrl.
    page_url = ers[0][0][0][0][1]

    def remap(url):
        return f"doc://{page}" if url == page_url else url

    want_entities = [(n, remap(u), p)
                     for ents, _ in ers for (n, u), p in ents]
    want_triples = [(s[0], r, o[0], o[1])
                    for _, rels in ers for s, r, o in rels]
    got_entities = [(e["name"], e["url"], e["props"])
                    for e in res["entities"]]
    got_triples = [(t["subj_name"], t["rel"], t["obj_name"], t["obj_url"])
                   for t in res["triples"]]
    assert got_entities == want_entities
    assert got_triples == want_triples
    assert all(t["subj_url"] == f"doc://{page}" for t in res["triples"])


@pytest.mark.parametrize("path", sorted(glob.glob(PKL_GLOB)))
def test_reference_basic_info_entity_parity(path):
    tables, ers = load_golden(path)
    golden = first_person_info(tables)
    assert golden is not None, f"no person-info table in {path}"

    # the reference's extracted entity for this page (first ER entry)
    ref_entities = ers[0][0] if ers and ers[0] else []
    assert ref_entities, f"no golden entity in {path}"
    ref_name, ref_url = ref_entities[0][0]
    ref_props = ref_entities[0][1]

    html = rebuild_basic_info_html(golden)
    page_name = ref_name  # reference uses URL-derived page name as doc key
    res = extract_document(
        page_name,
        [{"kind": "html", "text": html, "media_ref": "", "offset": 0}],
    )
    assert len(res["entities"]) == 1, res["entities"]
    ent = res["entities"][0]
    assert ent["name"] == ref_name
    assert ent["props"] == ref_props
    # identity model: reference carries the crawl URL; rebuild carries
    # doc://<doc_id> (documented deviation)
    assert ent["url"] == f"doc://{page_name}"
    assert ref_url.startswith("https://baike.baidu.com/")

    # structural parity of the normalized table
    tbl = res["tables"][0]
    assert tbl["table_type"] == "person_info"
    assert tbl["direction"] == "COL"
    # post-flip: our grid is 2 x n_props; reference stores n_props x 2
    assert len(tbl["cells"][0]) == golden["rowNumber"]
    assert [c["content"] for c in tbl["cells"][0]] == [
        str(r[0].__dict__.get("content")) for r in golden["cell"]
    ]


# ---------------------------------------------------------------------------
# ER output-format goldens (赵匡胤 page family): the one reference artifact
# family previously unused by tests — file/Triad/*.csv and file/json/*.json.
# These anchor the SINK formats (io_sinks) to reference bytes, independent
# of the pipeline's own pinned oracles.
# ---------------------------------------------------------------------------

REL_CSV = "/root/reference/file/Triad/relationship.csv"
ENT_CSV = "/root/reference/file/Triad/entity.csv"
ENT_JSON = "/root/reference/file/json/entity.json"


def _parse_concat_json(path):
    """file/json/*.json are APPEND-MODE artifacts: one json.dump per
    extraction session concatenated in a single file (FileIO.write2Json,
    FileIO.py:119-131, mode='w+' re-used with append semantics by the
    caller). Parse every chunk and flatten the entries."""
    import json

    dec = json.JSONDecoder()
    with open(path, encoding="utf-8") as f:
        s = f.read()
    out, i = [], 0
    while i < len(s):
        while i < len(s) and s[i].isspace():
            i += 1
        if i >= len(s):
            break
        val, i = dec.raw_decode(s, i)
        out.extend(val)
    return out


def _read_part_lines(out_dir):
    lines = []
    for p in sorted(glob.glob(out_dir + "/part-*")):
        with open(p, encoding="utf-8") as f:
            lines += [ln.rstrip("\n") for ln in f if ln.strip()]
    return lines


def test_write_triples_csv_bytes_match_reference(spark, tmp_path):
    """Full-file byte parity for S12/write_triples_csv: reconstruct the
    triple rows by parsing the reference relationship.csv, write them
    through the Spark sink, and require multiset equality of the emitted
    LINES against all 111 golden lines (row order is Spark-partition
    order; the reference's is crawl order)."""
    import ast
    import csv
    from collections import Counter

    from webtableextractionsystem_spark import io_sinks

    with open(REL_CSV, encoding="utf-8", newline="") as f:
        golden_lines = [ln for ln in f.read().split("\n") if ln]
    rows = list(csv.reader(golden_lines))
    recon = []
    for subj, rel, obj in rows:
        sn, su = ast.literal_eval(subj)
        on, ou = ast.literal_eval(obj)
        recon.append(("d", 0, sn, su, rel, on, ou))
    triples = spark.createDataFrame(
        recon,
        "doc_id string, seq int, subj_name string, subj_url string, "
        "rel string, obj_name string, obj_url string")
    out = str(tmp_path / "rel_csv")
    io_sinks.write_triples_csv(triples, out)
    assert Counter(_read_part_lines(out)) == Counter(golden_lines)


def test_write_entity_props_csv_lines_match_reference(spark, tmp_path):
    """entity.csv golden: rebuild the 赵匡胤 entity's property rows from
    the parsed entity.json and require every emitted line to be
    byte-identical to a line of the reference entity.csv."""
    from webtableextractionsystem_spark import io_sinks

    entries = _parse_concat_json(ENT_JSON)
    (name, url), props = entries[0]
    assert name == "赵匡胤" and props
    ents = spark.createDataFrame(
        [("d", 0, name, url, props)],
        "doc_id string, seq int, name string, url string, "
        "props map<string,string>")
    out = str(tmp_path / "ent_csv")
    io_sinks.write_entity_props_csv(ents, out)
    produced = _read_part_lines(out)
    with open(ENT_CSV, encoding="utf-8", newline="") as f:
        golden = {ln for ln in f.read().split("\n") if ln}
    assert len(produced) == len(props)
    missing = [ln for ln in produced if ln not in golden]
    # the reference's OWN artifacts disagree on one key: entity.csv
    # stores 谥号=英武圣文神德皇帝 while entity.json stores
    # 英武圣文神德皇帝（初谥） (different extraction sessions). Our rows are
    # rebuilt from the json, so exactly that one line may miss the csv.
    assert missing == ["赵匡胤,谥号,英武圣文神德皇帝（初谥）"], missing[:3]


def test_write_entities_json_entry_matches_reference(spark, tmp_path):
    """entity.json golden: the sink's line for the reconstructed 赵匡胤
    row must parse to an entry STRUCTURALLY IDENTICAL to the golden's
    first entry ([[name, url], {props}] — same shape, same keys, same
    values; whole-file layout is the reference's append-session artifact,
    not part of the entry format)."""
    import json

    from webtableextractionsystem_spark import io_sinks

    entries = _parse_concat_json(ENT_JSON)
    golden = entries[0]
    (name, url), props = golden
    ents = spark.createDataFrame(
        [("d", 0, name, url, props)],
        "doc_id string, seq int, name string, url string, "
        "props map<string,string>")
    out = str(tmp_path / "ent_json")
    io_sinks.write_entities_json(ents, out)
    lines = _read_part_lines(out)
    assert len(lines) == 1
    assert json.loads(lines[0]) == golden


def test_seed_frontier_on_reference_seed_file(spark):
    """S2 over the reference's ACTUAL seed file
    (file/spider/PersonUrlSeedLink.txt): 3 seeds in file order; the two
    category pages (中国名人, 文学家 — decoded last segment is 2-4 CJK
    chars, no dot) classify keep=true, the numeric-suffixed item page
    does not. Values pinned from an independent re-derivation of the
    F1/F2 predicates."""
    from webtableextractionsystem_spark.operators.urlfilters import (
        seed_frontier,
    )

    rows = seed_frontier(
        spark, "/root/reference/file/spider/PersonUrlSeedLink.txt"
    ).orderBy("seq").collect()
    assert len(rows) == 3  # trailing newline is not a 4th record
    assert [r["seq"] for r in rows] == [1, 2, 3]
    assert [r["keep"] for r in rows] == [True, False, True]
    assert rows[0]["url"].endswith("%E4%B8%AD%E5%9B%BD%E5%90%8D%E4%BA%BA")
    assert rows[1]["relevance"] == 0  # last segment '6516750' is not a name
    assert rows[2]["possible"] and rows[2]["relevance"] == 1


def test_lexicons_equal_reference_configuration():
    """The pinned lexicon constants must equal the reference's ACTUAL
    configuration artifacts byte-for-byte (order included where the
    reference iterates in order). personInfo.json is exempt by design:
    the reference mutates it at runtime (fusionJsonWord, table.py:799-
    809) and the file on disk is one arbitrary snapshot (its content is
    plum-cultivar pollution from a non-person page); FIXTURES.md §3 pins
    a stable seed set instead."""
    import json
    import pickle

    from webtableextractionsystem_spark import lexicons as LX

    base = "/root/reference/file/configuration"

    def load(name):
        with open(f"{base}/PersonTable/{name}.json", encoding="utf-8") as f:
            return json.load(f)

    assert list(LX.PERSON_NAME_HEADERS) == load("personName")
    assert list(LX.PROPERTY_RELATIONSHIP) == load("propertyRelationship")
    assert list(LX.CAPTION_RELATIONSHIP) == load("captionRelationship")
    with open(f"{base}/urlTableMap/baike.baidu.com.json",
              encoding="utf-8") as f:
        assert json.load(f) == {"class": LX.BASIC_INFO_CLASS}
    with open(f"{base}/other/WordMap.pkl", "rb") as f:
        assert pickle.load(f) == LX.WORD_MAP
    # the documented personInfo deviation: reference snapshot is mutated
    # state, ours is the pinned seed set — assert they indeed DIFFER so
    # a silent future "fix" to copy the snapshot gets flagged
    assert set(load("personInfo")) != set(LX.PERSON_INFO_PROPERTIES)


def test_write_triples_json_entry_matches_reference(spark, tmp_path):
    """relationship.json golden (the last unanchored ER artifact): the
    sink's line for a reconstructed golden triple must parse to an entry
    STRUCTURALLY IDENTICAL to the reference's
    [[subj, subj_url], rel, [obj, obj_url]] first entry."""
    import json

    from webtableextractionsystem_spark import io_sinks

    entries = _parse_concat_json("/root/reference/file/json/relationship.json")
    golden = entries[0]
    (sn, su), rel, (on, ou) = golden
    assert sn == "赵匡胤" and rel == "高祖父"
    triples = spark.createDataFrame(
        [("d", 0, sn, su, rel, on, ou)],
        "doc_id string, seq int, subj_name string, subj_url string, "
        "rel string, obj_name string, obj_url string")
    out = str(tmp_path / "rel_json")
    io_sinks.write_triples_json(triples, out)
    lines = _read_part_lines(out)
    assert len(lines) == 1
    assert json.loads(lines[0]) == golden
    # escaping sanity: a rel containing a quote must stay valid JSON
    tricky = spark.createDataFrame(
        [("d", 0, 'a"b', "u1", 'r"el', "c", "u2")],
        "doc_id string, seq int, subj_name string, subj_url string, "
        "rel string, obj_name string, obj_url string")
    out2 = str(tmp_path / "rel_json2")
    io_sinks.write_triples_json(tricky, out2)
    assert json.loads(_read_part_lines(out2)[0]) == [
        ['a"b', "u1"], 'r"el', ["c", "u2"]]


def test_reference_manual_page_golden():
    """Fourth reference-anchored input page: the repo's own 80 KB
    Asciidoctor-generated manual (file/说明书/Web表格信息抽取系统.html) —
    real third-party HTML the pipeline never saw during development.
    Pins (a) the DOM pre-treatment on it: scripts/styles stripped, the
    element census and the exact concatenated text (boilerplate-strip
    anchor), and (b) end-to-end extraction: the page has no <table>
    markup, so the heuristic gate must admit NOTHING — zero spans,
    tables, triples and, critically, zero errors (robustness: an 80 KB
    foreign page neither crashes nor fabricates tables)."""
    import hashlib
    from collections import Counter

    from webtableextractionsystem_spark.kernel.dom import pre_treat
    from webtableextractionsystem_spark.kernel.pipeline import (
        extract_document,
    )

    path = "/root/reference/file/说明书/Web表格信息抽取系统.html"
    html = open(path, encoding="utf-8").read()
    # the exact artifact this golden pins: 79,691 bytes / 67,109 chars
    assert len(html.encode("utf-8")) == 79691 and len(html) == 67109

    root = pre_treat(html)
    nodes = list(root.iter_desc())
    census = Counter(n.name for n in nodes)
    assert len(nodes) == 526
    assert census["script"] == 0 and census["style"] == 0  # stripped
    assert census["div"] == 231 and census["p"] == 103
    assert census["a"] == 65 and census["img"] == 14 and census["pre"] == 23
    text = root.text
    assert len(text) == 7062
    assert hashlib.md5(text.encode()).hexdigest() == \
        "02509700cb006bd45d85fad4732f4f7a"
    assert text.startswith("Web表格信息抽取系统使用说明")

    res = extract_document(
        "manual", [{"kind": "html", "text": html, "media_ref": "",
                    "offset": 0}])
    assert res["n_errors"] == 0
    assert res["n_spans"] == 0 and res["out_spans"] == []
    assert res["tables"] == [] and res["triples"] == []
