"""Property tests for URL canonicalization (hypothesis): idempotency and
output validity over arbitrary inputs — layer-4 of the SURVEY §5 pyramid."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from data_collector_spark.functions.urls import canonicalize_url

CANON_RE = re.compile(r"^(http|https)://[^/?#]+(/[^?#]*)?(\?[^#]*)?$")

url_like = st.one_of(
    st.text(max_size=120),
    st.builds(
        lambda scheme, host, port, path, q, frag: f"{scheme}://{host}{port}{path}{q}{frag}",
        st.sampled_from(["http", "HTTP", "https", "HtTpS", "ftp", "x1+z.a"]),
        st.from_regex(r"[A-Za-z0-9.\-]{1,20}", fullmatch=True),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,10}){0,4}/?", fullmatch=True),
        st.sampled_from(["", "?", "?a=1", "?b=2&a=1", "?z&y&x"]),
        st.sampled_from(["", "#frag", "#a#b"]),
    ),
)


@given(url_like)
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent_and_valid(raw):
    c = canonicalize_url(raw)
    if c is None:
        return
    # well-formed output
    assert CANON_RE.match(c), c
    # scheme+host lowercase, no default port, no fragment
    head = c.split("/", 3)[2]
    assert head == head.lower()
    # default port stripped per scheme (http:443 / https:80 are NOT default)
    if c.startswith("http://"):
        assert not head.endswith(":80")
    else:
        assert not head.endswith(":443")
    assert "#" not in c
    # sorted query params
    if "?" in c:
        q = c.split("?", 1)[1]
        assert q == "&".join(sorted(q.split("&")))
    # idempotent
    assert canonicalize_url(c) == c
