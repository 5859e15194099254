"""Fetch-and-extract: HTML binary -> text + links, as vectorized pandas UDFs.

The reference's extract step is ``search_and_shrink_zip`` — bytes in,
filtered structured text out (/root/reference/src/actions/collect/
sec_companies.rs:143-179); its explode step is ``transpose_sec_companies``
(one row per ticker, sec_companies.rs:288-313). Here: one ``mapInPandas``
pass decodes the page payload, extracts visible text (the byte-identical
invariant from BASELINE.json input_hint) and the outgoing link array,
which the caller explodes (SURVEY.md F12).

Extraction rules (pure, deterministic, pinned by golden tests):
1. decode UTF-8 (errors -> U+FFFD)
2. drop <script>/<style> elements and HTML comments
3. every remaining tag -> single space
4. unescape the five core entities (&amp; &lt; &gt; &quot; &#39;)
5. collapse runs of whitespace to one space; strip ends
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_SCRIPT_RE = r"(?is)<(script|style)[^>]*>.*?</\1\s*>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"(?s)<[^>]*>"
_WS_RE = r"\s+"
_HREF_RE = r"(?is)<a\s[^>]*?href\s*=\s*\"([^\"]*)\""


def _decode_cell(v) -> str:
    """Per-element decode: a batch may mix NULLs with bytes (or arrive as
    str from a string-typed column) — sniffing only the first element
    corrupted whole batches whose first value was NULL."""
    if v is None:
        return ""
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", "replace")
    return str(v)


def _decode(html: pd.Series) -> pd.Series:
    return html.map(_decode_cell)


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized text extraction; input bytes or str Series."""
    s = _decode(html)
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_COMMENT_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    s = s.str.replace("&lt;", "<", regex=False)
    s = s.str.replace("&gt;", ">", regex=False)
    s = s.str.replace("&quot;", '"', regex=False)
    s = s.str.replace("&#39;", "'", regex=False)
    s = s.str.replace("&amp;", "&", regex=False)
    s = s.str.replace(_WS_RE, " ", regex=True)
    return s.str.strip()


def extract_text_bytes(html: bytes) -> str:
    """Scalar wrapper used by the generator to produce the golden text."""
    return extract_text_series(pd.Series([html])).iloc[0]


def extract_links_series(html: pd.Series, base_url: pd.Series | None = None) -> pd.Series:
    """Outgoing hrefs per page as list[str]; resolves root-relative links."""
    s = _decode(html)
    links = s.str.findall(_HREF_RE)
    if base_url is None:
        return links
    origin = base_url.str.extract(r"^([a-z]+://[^/?#]+)", expand=False).fillna("")

    def resolve(pair: tuple[list[str], str]) -> list[str]:
        ls, org = pair
        return [org + l if l.startswith("/") else l for l in ls]

    return pd.Series(
        map(resolve, zip(links, origin)), index=links.index, dtype="object"
    )


def with_extracted(
    pages: DataFrame, html_col: str = "html", canonicalize_links: bool = False
) -> DataFrame:
    """Add extracted_text + links (array<string>) via one Arrow-batched pass.

    mapInPandas (not two scalar UDFs) so the payload bytes cross the
    JVM<->Python boundary once per batch. With canonicalize_links=True the
    link canonicalization (functions/urls.py rules) happens inside the
    same pass — the link set would otherwise take a second JVM->Python
    round trip at fan-out x links_per_page volume.
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pages.schema.fields
    )
    out_schema += ", extracted_text string, links array<string>"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_collector_spark.functions.urls import canonicalize_series

        for pdf in batches:
            base = pdf["url_canon"] if "url_canon" in pdf.columns else pdf["url"]
            links = extract_links_series(pdf[html_col], base)
            if canonicalize_links and len(pdf):
                flat = pd.Series(
                    [u for ls in links for u in ls], dtype="object"
                )
                counts = links.map(len).to_numpy()
                canon = canonicalize_series(flat).to_numpy() if len(flat) else []
                out, pos = [], 0
                for c in counts:
                    out.append([u for u in canon[pos:pos + c] if u is not None])
                    pos += c
                links = pd.Series(out, index=links.index, dtype="object")
            pdf = pdf.assign(
                extracted_text=extract_text_series(pdf[html_col]),
                links=links,
            )
            yield pdf

    return pages.mapInPandas(op, schema=out_schema)
