"""URL relevance filters (F1/F2, SURVEY.md §2.2).

The reference's crawl frontier classifies candidate links into useful /
possible / useless (UrlExtractor.extractUrl,
/root/reference/src/spider/UrlExtractor.py:23-78 and
WebSpider.dealWithPossibleUrl, WebSpider.py:202-216). Crawling is out of
scope for the rebuild, but the predicates themselves are useful over any
URL column (e.g. the hrefs the extractor harvests), so they're provided
as vectorized DataFrame filters:

* F2 ``is_possible_item_url`` — startswith the baike item prefix AND the
  last path segment contains no '.' (WebSpider.py:209-214).
* F1 ``person_url_relevance`` — the reference asks HanLP whether the
  URL-decoded last segment is a single person name (nature 'nr');
  replaced by the deterministic proxy (SURVEY §7 HanLP elimination):
  decoded segment is 2-4 CJK chars. Relevance in {0,1} against the
  reference's 0.8 threshold (UrlExtractor.py:69-78).

All expressions are JVM-side (url_decode / regexp) — no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ITEM_PREFIX = "https://baike.baidu.com/item/"
RE_PERSON_NAME = "^[一-龥]{2,4}$"


def last_segment(url: Column) -> Column:
    return F.element_at(F.split(url, "/"), -1)


def is_possible_item_url(url: Column) -> Column:
    """F2: item-prefixed and last segment without '.'."""
    return url.startswith(ITEM_PREFIX) & ~last_segment(url).contains(".")


def person_url_relevance(url: Column) -> Column:
    """F1 proxy: 1 when the decoded last segment looks like a CJK person
    name, else 0 (threshold 0.8 keeps only relevance 1). try_url_decode:
    a malformed percent-escape in one href must classify as irrelevant,
    not fail the job."""
    decoded = F.try_url_decode(last_segment(url))
    return F.when(decoded.rlike(RE_PERSON_NAME), F.lit(1)).otherwise(F.lit(0))


def classify_urls(df, url_col: str = "url"):
    """(url, possible, relevance, keep) — keep mirrors the reference's
    'useful' routing: possible AND relevance >= 0.8."""
    url = F.col(url_col)
    rel = person_url_relevance(url)
    possible = is_possible_item_url(url)
    return df.select(
        url.alias("url"),
        possible.alias("possible"),
        rel.alias("relevance"),
        (possible & (rel >= F.lit(0.8))).alias("keep"),
    )
