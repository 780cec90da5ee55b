"""URL canonicalization & features — the web-curation front door.

URL-level dedup (the cheapest dedup pass a web corpus gets: CCNet,
RefinedWeb and FineWeb all run it BEFORE any content hashing) only
works if ``http://Example.com/a?utm_source=x`` and
``https://example.com/a`` collapse to one key.  These are pure
column expressions (no UDFs, no shuffle): canonicalize, then feed the
result to ``operators.dedup.exact_dedup`` — the URL pass is exactly
the exact-dedup machinery on a canonical key.

``registered_domain`` is the approximation "last two host labels, or
three when the 2nd-level label is a common country-code second level
(co/com/ac/gov/org/net/edu)" — the full public-suffix list is a data
file, not logic; swap it in at deployment by broadcasting the PSL as
a join table if label-exact grouping matters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never change content identity (trackers)
TRACKING_PARAMS = (
    "utm_[^=&]*", "fbclid", "gclid", "msclkid", "dclid", "igshid",
    "mc_cid", "mc_eid", "yclid", "_hsenc", "_hsmi", "ref_src",
)

_TRACKING_RE = "^(" + "|".join(TRACKING_PARAMS) + ")(=.*)?$"


def _host(url: Column) -> Column:
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def canonical_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, DEFAULT ports stripped
    (80 for http, 443 for https) while non-default ports are KEPT —
    ``parse_url``'s HOST silently drops every port, which would
    collapse different origins (example.com:8080 vs example.com) onto
    one dedup key; fragment dropped, tracking query params removed and
    the remainder SORTED (param order never changes content), trailing
    slashes stripped; ``http``/``https`` distinction is KEPT (they can
    serve different content).  NULL in → NULL out; strings parse_url
    cannot parse yield a NULL host and fall back to the trimmed
    original, so ill-formed rows still dedup on raw equality instead
    of collapsing onto one NULL key."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = _host(url)
    # the explicit port, from the authority (parse_url HOST drops it)
    raw_port = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*:(\d+)(?:[/?#]|$)", 1
    )
    # numeric comparison + numeric re-render: ':080' ≡ ':80' ≡ default
    # (string comparison would keep leading-zero ports and split one
    # origin across keys — review finding)
    port_n = F.when(raw_port != "", raw_port.cast("int"))
    keep_port = (
        port_n.isNotNull()
        & ~((scheme == "http") & (port_n == 80))
        & ~((scheme == "https") & (port_n == 443))
    )
    hostport = F.when(
        keep_port, F.concat(host, F.lit(":"), port_n.cast("string"))
    ).otherwise(host)
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    # strip ALL trailing slashes (a single-slash strip is not
    # idempotent on "//" paths — found by the hypothesis test); the
    # bare root collapses to no path so example.com and example.com/
    # share a key
    path = F.regexp_replace(path, "/+$", "")
    query = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    kept = F.array_join(
        F.sort_array(
            F.filter(
                F.split(query, "&"),
                lambda kv: (kv != "") & ~kv.rlike(_TRACKING_RE),
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme, F.lit("://"), hostport, path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )
    return F.when(host.isNull(), F.trim(url)).otherwise(canon)


def url_features(url: Column) -> Column:
    """Struct ``(scheme, host, registered_domain, path_depth,
    n_params, is_secure)`` for per-host/per-domain curation stats
    (domain mixing weights, host-level spam priors, PageRank keys)."""
    host = _host(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    take3 = (n >= 3) & second.rlike("^(co|com|ac|gov|org|net|edu)$")
    reg = F.when(
        n >= 2,
        F.when(
            take3,
            F.concat_ws(
                ".", F.element_at(labels, -3), F.element_at(labels, -2),
                F.element_at(labels, -1),
            ),
        ).otherwise(
            F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
        ),
    ).otherwise(host)
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    query = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    n_params = F.size(F.filter(F.split(query, "&"), lambda s: s != ""))
    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    return F.struct(
        scheme.alias("scheme"),
        host.alias("host"),
        reg.alias("registered_domain"),
        depth.cast("long").alias("path_depth"),
        n_params.cast("long").alias("n_params"),
        scheme.eqNullSafe("https").alias("is_secure"),
    )
