"""Driver-side remote document loader (SURVEY.md §2 S2/S3).

At cluster scale executors never do per-row HTTP: every remote context
is pre-resolved HERE (on the driver, before the job) into a plain dict
that the extraction UDF captures by value — the Spark replacement for
the reference's ``DocumentLoader`` + ``JarCacheStorage`` pair.

Edge semantics replicated from the reference and the JSON-LD API spec:

* injected documents take precedence and never hit the network
  (``DocumentLoader.java:56-62``);
* remote loading can be disallowed entirely
  (``DocumentLoader.java:65-70``, the
  ``com.github.jsonldjava.disallowRemoteContextLoading`` system
  property) → ``loading remote context failed``;
* only HTTP 200/203 are acceptable after redirects
  (``JsonUtils.java:366-369``);
* ``Link: <...>; rel="alternate"; type="application/ld+json"`` on a
  non-``application/ld+json`` response is followed, at most
  ``MAX_LINKS_FOLLOW`` (20) hops (``JsonUtils.java:370-378,384-413``);
* ``Link: <...>; rel="http://www.w3.org/ns/json-ld#context"`` on a
  non-ld+json response supplies an out-of-band context; **more than
  one** such header is the typed error ``multiple context link
  headers`` (JSON-LD-API §LoadDocumentCallback; the reference defines
  the code in ``JsonLdError.java:43`` but never raises it — we do).

HTTP transport is injectable (``http_get(url) -> (status, headers,
body)``) so the semantics are unit-testable without a network and a
production deployment can plug in its own client.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Callable, Iterable

from ..core.errors import JsonLdError

MAX_LINKS_FOLLOW = 20  # reference: JsonUtils.java:74
MAX_REDIRECTS = 20
JSONLD_CONTEXT_REL = "http://www.w3.org/ns/json-ld#context"
ACCEPT_HEADER = ("application/ld+json, application/json;q=0.9, "
                 "application/javascript;q=0.5, text/javascript;q=0.5, "
                 "text/plain;q=0.2, */*;q=0.1")  # JsonUtils.java:59

_REDIRECT_CODES = {301, 302, 303, 307, 308}


@dataclass
class RemoteDocument:
    """What ``loadDocument`` returns (reference ``RemoteDocument.java``),
    plus the out-of-band context URL a Link header may have supplied."""
    document_url: str
    document: object
    context_url: str | None = None


def _split_outside_quotes(value: str, sep: str) -> list[str]:
    """Split on ``sep`` occurrences that are outside ``"..."`` quoted
    strings and outside ``<...>`` URI references (RFC 8288 grammar)."""
    parts: list[str] = []
    cur: list[str] = []
    in_quote = in_angle = False
    for ch in value:
        if in_quote:
            cur.append(ch)
            if ch == '"':
                in_quote = False
        elif ch == '"':
            in_quote = True
            cur.append(ch)
        elif ch == "<":
            in_angle = True
            cur.append(ch)
        elif ch == ">":
            in_angle = False
            cur.append(ch)
        elif ch == sep and not in_angle:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _parse_link_header(value: str) -> list[tuple[str, dict[str, str]]]:
    """One Link HEADER (which RFC 8288 allows to carry several
    comma-separated link-values) → [(target, {param: value}), ...]."""
    links = []
    for link_value in _split_outside_quotes(value, ","):
        target = ""
        params: dict[str, str] = {}
        for part in _split_outside_quotes(link_value, ";"):
            if part.startswith("<") and part.endswith(">"):
                target = part[1:-1]
            elif "=" in part:
                k, _, v = part.partition("=")
                params[k.strip().lower()] = v.strip().strip('"')
        links.append((target, params))
    return links


def _resolve_relative(base_url: str, target: str) -> str:
    from urllib.parse import urljoin
    return urljoin(base_url, target)


def _default_http_get(url: str):  # pragma: no cover - needs a network
    from urllib.request import Request, urlopen
    req = Request(url, headers={"Accept": ACCEPT_HEADER})
    with urlopen(req) as resp:  # noqa: S310 - driver-side by design
        headers = [(k, v) for k, v in resp.headers.items()]
        return resp.status, headers, resp.read().decode("utf-8")


class DriverDocumentLoader:
    """Pre-resolves remote JSON-LD documents/contexts on the driver.

    ``http_get(url) -> (status:int, headers:list[(name,value)],
    body:str)`` must NOT follow redirects itself — this class implements
    the redirect/Link policy so the edge semantics are testable.
    """

    def __init__(self, injected: dict[str, object] | None = None,
                 http_get: Callable | None = None,
                 allow_remote: bool = True):
        self.injected = dict(injected or {})
        self.http_get = http_get or _default_http_get
        self.allow_remote = allow_remote

    def inject(self, url: str, document: object) -> None:
        self.injected[url] = document

    # -- core policy ------------------------------------------------------

    def load_document(self, url: str) -> RemoteDocument:
        if url in self.injected:
            return RemoteDocument(url, self.injected[url])
        if not self.allow_remote:
            raise JsonLdError(
                JsonLdError.LOADING_REMOTE_CONTEXT_FAILED,
                f"Remote context loading has been disallowed (url was {url})")
        try:
            return self._fetch(url, links_followed=0)
        except JsonLdError:
            raise
        except Exception as e:
            raise JsonLdError(JsonLdError.LOADING_REMOTE_CONTEXT_FAILED,
                              f"{url}: {e}") from e

    def _fetch(self, url: str, links_followed: int) -> RemoteDocument:
        status, headers, body = self.http_get(url)
        redirects = 0
        while status in _REDIRECT_CODES:
            redirects += 1
            if redirects > MAX_REDIRECTS:
                raise JsonLdError(
                    JsonLdError.LOADING_REMOTE_CONTEXT_FAILED,
                    f"too many redirects resolving {url}")
            location = _header(headers, "location")
            if not location:
                raise JsonLdError(
                    JsonLdError.LOADING_REMOTE_CONTEXT_FAILED,
                    f"redirect without Location for {url}")
            url = _resolve_relative(url, location)
            status, headers, body = self.http_get(url)
        if status not in (200, 203):  # JsonUtils.java:366-369
            raise JsonLdError(
                JsonLdError.LOADING_REMOTE_CONTEXT_FAILED,
                f"Can't retrieve {url}, status code: {status}")

        content_type = (_header(headers, "content-type") or "") \
            .split(";")[0].strip()
        context_url = None
        if content_type != "application/ld+json":
            links = [lv for k, v in headers if k.lower() == "link"
                     for lv in _parse_link_header(v)]
            # alternate document location (JsonUtils.java:370-413)
            for target, params in links:
                if (params.get("rel") == "alternate"
                        and params.get("type") == "application/ld+json"
                        and target):
                    if links_followed + 1 > MAX_LINKS_FOLLOW:
                        raise JsonLdError(
                            JsonLdError.LOADING_REMOTE_CONTEXT_FAILED,
                            "Too many alternate links followed. This may "
                            "indicate a cycle. Aborting.")
                    return self._fetch(_resolve_relative(url, target),
                                       links_followed + 1)
            # out-of-band context Link headers (JSON-LD-API)
            ctx_links = [t for t, p in links
                         if p.get("rel") == JSONLD_CONTEXT_REL and t]
            if len(ctx_links) > 1:
                raise JsonLdError(
                    JsonLdError.MULTIPLE_CONTEXT_LINK_HEADERS,
                    f"{url} returned {len(ctx_links)} context link headers")
            if ctx_links:
                context_url = _resolve_relative(url, ctx_links[0])
        return RemoteDocument(url, json.loads(body), context_url)

    # -- broadcastable cache ----------------------------------------------

    def resolve_all(self, urls: Iterable[str]) -> dict[str, object]:
        """Pre-resolve every URL (and any out-of-band context it points
        to) into the plain ``{url: document}`` dict the extraction UDFs
        capture by value. This is the ONLY place HTTP happens — the dict
        ships to executors; they never fetch."""
        cache: dict[str, object] = {}
        for url in urls:
            if url in cache:
                continue
            doc = self.load_document(url)
            cache[url] = doc.document
            if doc.context_url and doc.context_url not in cache:
                cache[doc.context_url] = \
                    self.load_document(doc.context_url).document
        return cache


def _header(headers: list[tuple[str, str]], name: str) -> str | None:
    for k, v in headers:
        if k.lower() == name:
            return v
    return None
