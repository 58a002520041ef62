"""HTML extraction kernel — pure Python stdlib, no Spark imports.

Re-implements the reference extraction semantics byte-identically
(reference: /root/reference/crawler/parser.py:14-151) on top of
``html.parser`` because lxml/bs4 are unavailable in this environment.
Everything here is plain-Python so it can run inside an Arrow-batched
pandas UDF (see functions/udfs.py) with zero Spark-side per-row work.

Semantics reproduced (citations into /root/reference/crawler/parser.py):

* parser.py:14   HTML_COMPONENT_SEARCH regex (verbatim below)
* parser.py:15   HTML_EXTERNAL_SITE regex (verbatim below)
* parser.py:16   HTML_WHITESPACE \\s+ collapse
* parser.py:71-76  title = first ``.//title`` text stripped; no title
                   => whole page dropped (returns None)
* parser.py:73   language = root element ``lang`` attribute
* parser.py:133-151 cleaned body: drop subtrees matching
                   .o-header .o-footer .skip-nav img script style,
                   preserving dropped elements' tail text (lxml
                   ``drop_tree`` keeps tails)
* parser.py:78-83  text = whitespace-collapsed text_content() of the
                   cleaned body; None when no <body>
* parser.py:90-96  links = unique raw hrefs of <a> in cleaned body
* parser.py:98-113 /external-site/?ext_url=X unwrap
* parser.py:115  links sorted (codepoint sort)
* parser.py:117-120 components = sorted set of regex matches over the
                   serialized cleaned body
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import List, Optional
from urllib import parse

# Verbatim from reference parser.py:14-16.
HTML_COMPONENT_SEARCH = re.compile(r"(?:(?:class=\")|\s)((?:o|m|a)-[\w\-]*)")
HTML_EXTERNAL_SITE = re.compile("/external-site/")
HTML_WHITESPACE = re.compile(r"\s+")

# HTML5 void elements: never pushed on the open-element stack.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Minimal implied-end-tag table (HTML error recovery for the common
# cases our corpus can contain; libxml2 does the same for these).
_IMPLIED_END = {
    "p": frozenset(["p"]),
    "li": frozenset(["li"]),
    "tr": frozenset(["tr", "td", "th"]),
    "td": frozenset(["td", "th"]),
    "th": frozenset(["td", "th"]),
    "option": frozenset(["option"]),
    "dt": frozenset(["dt", "dd"]),
    "dd": frozenset(["dt", "dd"]),
}


class Element:
    """Tiny DOM node mirroring the subset of lxml API the kernel needs."""

    __slots__ = ("tag", "attrib", "text", "tail", "children", "parent")

    def __init__(self, tag: str, attrib=None, parent=None):
        self.tag = tag
        self.attrib = dict(attrib or {})
        self.text: Optional[str] = None
        self.tail: Optional[str] = None
        self.children: List["Element"] = []
        self.parent: Optional["Element"] = parent

    def get(self, key, default=None):
        return self.attrib.get(key, default)

    def iter(self):
        # Iterative DFS — adversarial web pages can nest thousands deep.
        stack = [self]
        while stack:
            el = stack.pop()
            yield el
            stack.extend(reversed(el.children))

    def find_first(self, tag: str) -> Optional["Element"]:
        for el in self.iter():
            if el.tag == tag:
                return el
        return None

    def find_child(self, tag: str) -> Optional["Element"]:
        for child in self.children:
            if child.tag == tag:
                return child
        return None

    def text_content(self) -> str:
        # lxml text_content(): depth-first concatenation of .text and
        # descendants' .text/.tail in document order. Iterative to
        # survive deeply nested adversarial pages.
        parts: List[str] = []
        stack: List[object] = [self]
        while stack:
            item = stack.pop()
            if isinstance(item, str):
                parts.append(item)
                continue
            if item.text:
                parts.append(item.text)
            for child in reversed(item.children):
                if child.tail:
                    stack.append(child.tail)
                stack.append(child)
        return "".join(parts)

    def class_tokens(self):
        return (self.attrib.get("class") or "").split()


class _TreeBuilder(HTMLParser):
    """Error-tolerant tree builder (stand-in for lxml.html.fromstring)."""

    def __init__(self):
        # convert_charrefs=True decodes entities in data and attribute
        # values, matching libxml2's decoding (&nbsp; -> \xa0 etc).
        super().__init__(convert_charrefs=True)
        self.roots: List[Element] = []
        self.stack: List[Element] = []
        # Raw text elements: children are opaque text.
        self._rawtext: Optional[str] = None

    # -- helpers ---------------------------------------------------
    def _append(self, el: Element) -> None:
        if self.stack:
            parent = self.stack[-1]
            el.parent = parent
            parent.children.append(el)
        else:
            self.roots.append(el)

    def _append_text(self, data: str) -> None:
        if not data:
            return
        if self.stack:
            parent = self.stack[-1]
            if parent.children:
                last = parent.children[-1]
                last.tail = (last.tail or "") + data
            else:
                parent.text = (parent.text or "") + data
        # Text outside any element is dropped (lxml does the same for
        # leading/stray document-level text in full documents).

    # -- HTMLParser hooks ------------------------------------------
    # Bound the open-element stack: libxml2's HTML parser caps nesting
    # (~256); beyond the cap we flatten extra elements as siblings so
    # text is preserved without unbounded recursion elsewhere.
    MAX_DEPTH = 512

    def handle_starttag(self, tag, attrs):
        # <body> implicitly closes <head> and anything open inside it
        # (libxml2/HTML5 recovery); same for a stray second <html>.
        if tag == "body" and self.stack:
            while len(self.stack) > 1:
                self.stack.pop()
        # Implied end tags (e.g. <p> auto-closes an open <p>).
        closes = _IMPLIED_END.get(tag)
        if closes and self.stack and self.stack[-1].tag in closes:
            self.stack.pop()
        attrib = {}
        for k, v in attrs:
            if k not in attrib:  # keep first duplicate, like libxml2
                attrib[k] = v if v is not None else ""
        el = Element(tag, attrib)
        self._append(el)
        if tag not in _VOID and len(self.stack) < self.MAX_DEPTH:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        attrib = {}
        for k, v in attrs:
            if k not in attrib:
                attrib[k] = v if v is not None else ""
        self._append(Element(tag, attrib))

    def handle_endtag(self, tag):
        # Pop to the nearest matching open element; ignore stray ends.
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        self._append_text(data)

    # Comments / PIs / doctype are not text content — ignore.
    def handle_comment(self, data):
        pass

    def handle_decl(self, decl):
        pass

    def handle_pi(self, data):
        pass


# Reference parity: the reference kills any parse after 5 s with a
# signal-based timeout and drops the page (parser.py:46-58). Signals
# don't work off the main thread / in executor workers, so the budget
# is enforced cooperatively: the document is fed to the parser in
# chunks with a monotonic-deadline check at each boundary (and before
# each downstream pass over the tree).
PARSE_BUDGET_S = 5.0
_FEED_CHUNK_CHARS = 1 << 14


class ParseTimeout(Exception):
    """Raised when a single document exceeds its parse-time budget."""


def _check_deadline(deadline: Optional[float]) -> None:
    if deadline is not None and time.monotonic() > deadline:
        raise ParseTimeout()


def parse_html_tree(
    html: str, deadline: Optional[float] = None
) -> Optional[Element]:
    """Parse an HTML document, returning its root element.

    Mirrors lxml.html.fromstring for full documents: the <html>
    element is the root; fragments get wrapped so ``find('./body')``
    style lookups still behave.  Returns None for empty input (the
    reference's soupparser fallback path raises/returns empty too).
    ``deadline`` (time.monotonic() value) bounds a pathological
    page's parse time; ParseTimeout propagates to the caller.
    """
    builder = _TreeBuilder()
    try:
        for i in range(0, max(1, len(html)), _FEED_CHUNK_CHARS):
            builder.feed(html[i : i + _FEED_CHUNK_CHARS])
            _check_deadline(deadline)
        builder.close()
    except ParseTimeout:
        raise
    except Exception:
        # Lenient fallback: best effort with whatever was built —
        # mirrors the reference's soupparser fallback (parser.py:125-130).
        pass

    roots = builder.roots
    if not roots:
        return None
    for el in roots:
        if el.tag == "html":
            return el
    if len(roots) == 1:
        return roots[0]
    wrapper = Element("html")
    wrapper.children = roots
    for r in roots:
        r.parent = wrapper
    return wrapper


_DROP_CLASS_SELECTORS = ("o-header", "o-footer", "skip-nav")
_DROP_TAG_SELECTORS = ("img", "script", "style")


def _drop_element(el: Element) -> None:
    """lxml ``drop_tree``: remove element + children, keep tail text."""
    parent = el.parent
    if parent is None:
        return
    idx = parent.children.index(el)
    tail = el.tail
    del parent.children[idx]
    el.parent = None
    if tail:
        if idx > 0:
            prev = parent.children[idx - 1]
            prev.tail = (prev.tail or "") + tail
        else:
            parent.text = (parent.text or "") + tail


def _is_detached(el: Element, body: Element) -> bool:
    """True when ``el`` is no longer attached under ``body`` (itself or
    an ancestor was dropped by an earlier selector pass)."""
    node = el
    while node is not None:
        if node is body:
            return False
        node = node.parent
    return True


def get_cleaned_body(root: Element) -> Optional[Element]:
    """Reference _get_cleaned_body_from_tree (parser.py:133-151).

    Selector passes run in the reference's order (order matters only
    for tail-merge corner cases), but the candidates for ALL six
    selectors are collected in ONE document-order walk instead of one
    walk per selector; each pass then skips candidates an earlier pass
    already detached (ancestor check) — the exact element set and
    order a fresh per-pass walk would visit, at a sixth of the walk
    cost (the kernel is the 100 TB hot path)."""
    body = root.find_child("body")
    if body is None:
        return None
    by_class: dict = {cls: [] for cls in _DROP_CLASS_SELECTORS}
    by_tag: dict = {tag: [] for tag in _DROP_TAG_SELECTORS}
    for el in body.iter():
        if el.tag in by_tag:
            by_tag[el.tag].append(el)
        if el.attrib.get("class"):
            for cls in el.class_tokens():
                if cls in by_class:
                    by_class[cls].append(el)
    for cls in _DROP_CLASS_SELECTORS:
        for el in by_class[cls]:
            if (el.parent is not None and not _is_detached(el, body)) or el is body:
                _drop_element(el)
    for tag in _DROP_TAG_SELECTORS:
        for el in by_tag[tag]:
            if el.parent is not None and not _is_detached(el, body):
                _drop_element(el)
    return body


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attr(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def serialize(el: Element) -> str:
    """XML-ish serialization equivalent to lxml.etree.tostring(...,
    encoding='unicode') for the purposes of the component regex
    (parser.py:117-120): class attributes appear as class="...", all
    inter-token whitespace preserved."""
    out: List[str] = []
    # Work stack of (node-or-literal); literals emitted verbatim.
    stack: List[object] = [el]
    while stack:
        item = stack.pop()
        if isinstance(item, str):
            out.append(item)
            continue
        e = item
        out.append("<" + e.tag)
        for k, v in e.attrib.items():
            out.append(f' {k}="{_escape_attr(v)}"')
        tail = _escape_text(e.tail) if e.tail else ""
        if not e.children and not e.text:
            out.append("/>")
            if tail:
                out.append(tail)
        else:
            out.append(">")
            if tail:
                stack.append(tail)
            stack.append("</" + e.tag + ">")
            for child in reversed(e.children):
                stack.append(child)
            if e.text:
                out.append(_escape_text(e.text))
    return "".join(out)


@dataclass
class ExtractedPage:
    """Mirror of the reference ParsedHTML dataclass (parser.py:19-27),
    minus the parse-time timestamp (the engine stamps rows itself)."""

    title: Optional[str]
    language: Optional[str]
    text: Optional[str]
    links: List[str] = field(default_factory=list)
    components: List[str] = field(default_factory=list)


def extract_page_fields(
    html: str,
    internal_link_host: str,
    time_budget_s: Optional[float] = PARSE_BUDGET_S,
) -> Optional[ExtractedPage]:
    """The full extraction kernel (reference _parse_html, parser.py:68-121).

    Returns None when the page has no <title> — the reference drops
    such pages entirely (parser.py:75-76, models.py:125-126). A page
    exceeding ``time_budget_s`` raises ParseTimeout (the reference's
    5 s parse kill, parser.py:46-58); the extract UDF catches it and
    drops the page, so one pathological document can never stall an
    executor task. ``time_budget_s=None`` disables the guard.
    """
    deadline = (
        time.monotonic() + time_budget_s if time_budget_s is not None else None
    )
    root = parse_html_tree(html, deadline)
    if root is None:
        return None

    title_tag = root.find_first("title")
    # Reference: title_tag.text.strip() (parser.py:72) — .text only,
    # not descendants. <title> with no text would raise there; treat
    # as missing title (page dropped) here.
    title = None
    if title_tag is not None and title_tag.text is not None:
        title = title_tag.text.strip()
    language = root.get("lang")

    if title is None:
        return None

    _check_deadline(deadline)
    body = get_cleaned_body(root)

    if body is not None:
        text = HTML_WHITESPACE.sub(" ", body.text_content()).strip()
    else:
        text = None
    _check_deadline(deadline)

    page = ExtractedPage(title=title, language=language, text=text)
    if body is None:
        return page

    hrefs = list(
        {
            el.attrib["href"]
            for el in body.iter()
            if el.tag == "a" and "href" in el.attrib
        }
    )

    # External-link unwrap (parser.py:98-113).
    for i, href in enumerate(hrefs):
        try:
            parsed_href = parse.urlparse(href)
        except ValueError:
            continue
        if not HTML_EXTERNAL_SITE.match(parsed_href.path):
            continue
        if parsed_href.netloc and internal_link_host != parsed_href.netloc:
            continue
        ext_url = parse.parse_qs(parsed_href.query).get("ext_url")
        if ext_url:
            hrefs[i] = ext_url[0]

    page.links = sorted(hrefs)

    _check_deadline(deadline)
    body_html = serialize(body)
    page.components = sorted(set(HTML_COMPONENT_SEARCH.findall(body_html)))
    return page
