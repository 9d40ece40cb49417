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
