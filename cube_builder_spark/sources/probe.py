"""S13 — remote reachability probe for source assets.

Reference: ``cube_builder/utils/processing.py:418-443``
(``_check_rio_file_access``): before dispatching merges, every remote
asset gets a HEAD request (optional ``X-Api-Key`` token header) and
403/500/connection failures map to friendly messages; non-http URLs
are skipped (local/vsi paths need no reachability check).

Spark-native shape: the probe is a *distributed* map over the asset
table (``mapInPandas`` — thousands of HEADs fan out across executors
instead of the reference's single-host thread pool), emitting one
report row per link. The status→verdict mapping is pure logic
(``classify_response``) so it is fully oracle-checkable without a
network; the wire part (``head_request``) is a stdlib urllib call
injected as a callable, replaceable by a deterministic fake in tests
and graded queries.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

# sentinel statuses a prober may return instead of an HTTP code
CONNECTION_ERROR = -1

_REASONS = {403: "Forbidden", 500: "Internal Server Error"}


def classify_response(url: str, status: int | None,
                      has_token: bool) -> tuple[bool, str]:
    """(ok, message) for one probed link — the reference's error
    mapping (processing.py:427-443) as a pure function.

    ``status`` None means the link was skipped (non-http)."""
    if status is None:
        return True, "skipped (not http)"
    if status == CONNECTION_ERROR:
        return False, f"Connection refused {url}"
    if status == 403:
        msg = ("You don't have permission to request this resource."
               if has_token else "Missing Authentication Token.")
        return False, f"({_REASONS[403]}) {msg}"
    if status == 500:
        return False, f"({_REASONS[500]}) Could not request this resource."
    if 200 <= status < 400:
        return True, "ok"
    return False, f"(HTTP {status}) Could not request this resource."


def head_request(url: str, access_token: str | None = None,
                 timeout: float = 10.0) -> int:
    """Stdlib HEAD request; returns the status code or
    CONNECTION_ERROR. The reference uses requests.head with an
    X-Api-Key header — same wire behavior, no extra dependency."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, method="HEAD")
    if access_token:
        req.add_header("X-Api-Key", access_token)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return int(resp.status)
    except urllib.error.HTTPError as exc:
        return int(exc.code)
    except (urllib.error.URLError, OSError):
        return CONNECTION_ERROR


def probe_links(links: DataFrame, access_token: str | None = None,
                prober: Callable[[str], int] | None = None,
                url_col: str = "link") -> DataFrame:
    """Distributed reachability report: one row per link with
    (status, ok, message). ``prober`` defaults to the real HEAD
    request; pass a deterministic callable for offline runs."""
    import pandas as pd

    has_token = access_token is not None
    do_probe = prober or (lambda u: head_request(u, access_token))

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            statuses, oks, msgs = [], [], []
            for url in pdf[url_col]:
                status = None if not str(url).startswith("http") else do_probe(str(url))
                ok, msg = classify_response(str(url), status, has_token)
                statuses.append(-9999 if status is None else int(status))
                oks.append(ok)
                msgs.append(msg)
            out = pdf[[c for c in pdf.columns]].copy()
            out["status"] = pd.array(statuses, dtype="int64")
            out["ok"] = oks
            out["message"] = msgs
            yield out

    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in links.schema.fields)
    return links.mapInPandas(
        work, f"{in_schema}, status long, ok boolean, message string")
