"""FROZEN per-page HTML extractor.

One stdlib-only (html.parser) pass per page produces BOTH:
  * the visible text (the byte-identical-per-url column: the corpus
    generator, the reference-semantics oracle, and the Ray pipeline all
    call ``extract_text`` — freezing the parser + whitespace policy as
    SURVEY.md §7 hard-part (f) requires), and
  * the entity record, reproducing the reference extractor's semantics
    (/root/reference/src/scrapers.py:611-690 ``_scrape_server_detail``):
      - name/author from first <h1> (fallback <title>), split on " by "
        (scrapers.py:629-635)
      - description from <meta name="description"> else first <p>
        (scrapers.py:638-644)
      - repository = first <a href~github.com> (scrapers.py:647-649)
      - tags from span/div whose class matches tag|label|badge; "#"
        stripped, else kept when len<20 (scrapers.py:652-658)
      - name/author fallback from URL path segments (scrapers.py:661-667)
      - id = "{prefix}_{name slug}" (scrapers.py:672; github variant
        scrapers.py:281, glama variant scrapers.py:855)
      - homepage = first non-github http link (scrapers.py:713-718)
      - tool names from <li class="tool"> elements — the structured
        analog of the glama tools projection (scrapers.py:841-849)
      - implementation_language / popularity / version / license from
        optional <meta> fields — structured stand-ins for the GitHub
        JSON projection fields (scrapers.py:293-302)

Text policy (frozen): every character-data run outside <script>/<style>,
``str.strip()``-ed, empties dropped, joined with "\\n". Element text
(h1/p/tags/tools) is each data run stripped then concatenated with ""
— mirroring BeautifulSoup ``get_text(strip=True)``.

DO NOT EDIT casually: changing any rule here invalidates the stored
``text`` column of every generated corpus and the parity oracle.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

_CLASS_TAGLIKE = re.compile(r"tag|label|badge")
_SKIP_TEXT_TAGS = frozenset(("script", "style"))

# Registry id prefixes (reference uses per-scraper prefixes:
# github_ scrapers.py:281, mcp_so_ scrapers.py:672, glama_api_ scrapers.py:855).
REGISTRY_ID_PREFIX = {
    "github": "github",
    "mcp.so": "mcp_so",
    "glama": "glama",
    "mcpmarket.com": "mcp_market",
}


@dataclass
class PageDoc:
    """Everything one parse pass collects from a page."""

    text: str = ""
    title: str | None = None
    h1: str | None = None
    first_p: str | None = None
    meta: dict = field(default_factory=dict)
    hrefs: list = field(default_factory=list)
    tags: list = field(default_factory=list)
    tools: list = field(default_factory=list)


class _PageParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.doc = PageDoc()
        self._text_parts: list[str] = []
        self._skip_depth = 0
        # capture stack entries: [tag, kind, buffer]; closed on matching end tag
        self._captures: list[list] = []

    # -- element handling -------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TEXT_TAGS:
            self._skip_depth += 1
            return
        a = dict(attrs)
        if tag == "meta":
            name = (a.get("name") or "").lower()
            if name and a.get("content") is not None:
                self.doc.meta.setdefault(name, a["content"])
            return
        if tag == "a":
            href = a.get("href")
            if href:
                self.doc.hrefs.append(href)
        kind = None
        if tag == "h1" and self.doc.h1 is None:
            kind = "h1"
        elif tag == "title" and self.doc.title is None:
            kind = "title"
        elif tag == "p" and self.doc.first_p is None:
            kind = "p"
        elif tag in ("span", "div") and _CLASS_TAGLIKE.search(a.get("class") or ""):
            kind = "tag"
        elif tag == "li" and (a.get("class") or "") == "tool":
            kind = "tool"
        if kind:
            self._captures.append([tag, kind, []])

    def handle_endtag(self, tag):
        if tag in _SKIP_TEXT_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        # close the innermost open capture for this tag (generated HTML
        # does not nest same-tag captures; first-open-first-close is fine)
        for i in range(len(self._captures) - 1, -1, -1):
            if self._captures[i][0] == tag:
                _, kind, buf = self._captures.pop(i)
                value = "".join(buf)  # buf entries are pre-stripped
                if kind == "h1" and self.doc.h1 is None:
                    self.doc.h1 = value
                elif kind == "title" and self.doc.title is None:
                    self.doc.title = value
                elif kind == "p" and self.doc.first_p is None:
                    self.doc.first_p = value
                elif kind == "tag":
                    self.doc.tags.append(value)
                elif kind == "tool":
                    self.doc.tools.append(value)
                break

    def handle_data(self, data):
        if self._skip_depth:
            return
        stripped = data.strip()
        if stripped:
            self._text_parts.append(stripped)
            for cap in self._captures:
                cap[2].append(stripped)

    def finish(self) -> PageDoc:
        self.doc.text = "\n".join(self._text_parts)
        return self.doc


def _decode(html) -> str:
    if isinstance(html, (bytes, bytearray, memoryview)):
        return bytes(html).decode("utf-8", errors="replace")
    return html or ""


def parse_html(html) -> PageDoc:
    """Single frozen parse pass. Never raises on malformed input."""
    p = _PageParser()
    try:
        p.feed(_decode(html))
        p.close()
    except Exception:
        pass  # keep whatever was collected before the parse error
    return p.finish()


def extract_text(html) -> str:
    """The byte-identical-per-url text column."""
    return parse_html(html).text


def name_slug(name: str) -> str:
    # scrapers.py:672
    return name.lower().replace(" ", "_").replace("-", "_")


def extract_entity(url: str, html, registry: str) -> dict | None:
    """HTML → raw entity record (pre-classification), or None.

    Convenience wrapper: parses then delegates. Hot paths that already
    hold a ``PageDoc`` must call ``extract_entity_from_doc`` instead so
    each page is parsed exactly once.
    """
    return extract_entity_from_doc(url, parse_html(html), registry)


def extract_entity_from_doc(url: str, doc: PageDoc, registry: str) -> dict | None:
    """Parsed page → raw entity record (pre-classification), or None.

    Returns a flat dict matching the nodes_raw schema; categories /
    operations are classified in a separate stage (classify.py) from the
    returned name/description/tool fields.
    """
    name = None
    author = None
    title_text = doc.h1 if doc.h1 is not None else doc.title
    if title_text:
        if " by " in title_text:
            name, author = title_text.split(" by ", 1)
        else:
            name = title_text

    description = doc.meta.get("description")
    if description is None and doc.first_p:
        description = doc.first_p

    repository = None
    homepage = None
    for href in doc.hrefs:
        if "github.com" in href:
            if repository is None:
                repository = href
        elif href.startswith("http") and homepage is None:
            homepage = href

    tags = []
    for t in doc.tags:
        if t.startswith("#"):
            tags.append(t[1:])
        elif len(t) < 20:
            tags.append(t)

    # URL fallback (scrapers.py:661-667): .../server/{name}/{author}
    if not name or not author:
        url_parts = url.split("/")
        if len(url_parts) >= 6:
            if not name:
                name = url_parts[-2]
            if not author:
                author = url_parts[-1]

    if not name:
        return None

    prefix = REGISTRY_ID_PREFIX.get(registry, registry)
    return {
        "id": f"{prefix}_{name_slug(name)}",
        "name": name,
        "author": author,
        "description": description,
        "repository": repository,
        "homepage": homepage,
        "version": doc.meta.get("version"),
        "license": doc.meta.get("license"),
        "implementation_language": doc.meta.get("language"),
        "popularity_score": int(doc.meta["popularity"]) if str(doc.meta.get("popularity", "")).isdigit() else 0,
        "download_count": 0,
        "data_types": tags,
        "tool_names": doc.tools,
        # capability structs (models.py:41-44): page HTML carries only
        # tool names — description/parameters arrive via the JSON
        # projectors (stages/ingest.py M10); raw_metadata likewise
        # (reference HTML detail scrape sets no raw_metadata).
        "tools": [{"name": t, "description": None, "parameters_json": None}
                  for t in doc.tools],
        "raw_metadata_json": None,
        "registry_source": registry,
        "source_url": url,
    }
