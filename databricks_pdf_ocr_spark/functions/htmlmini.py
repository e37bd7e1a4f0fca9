"""htmlmini — dependency-free HTML boilerplate stripper + block extractor.

North-rule component ("HTML boilerplate strip, DOM heuristics").  The
reference has no HTML path (it is PDF-only); this module supplies the
capability mandated by BASELINE.json's north_rule using classic
main-content heuristics:

- drop ``<script>/<style>/<template>`` content and comments entirely;
- drop subtrees rooted at boilerplate containers
  (``nav header footer aside form`` and elements whose ``class``/``id``
  match common chrome tokens: nav, menu, sidebar, footer, header, banner,
  cookie, ad, social, breadcrumb);
- emit remaining text grouped into *blocks* at block-element boundaries
  (``p, h1-h6, li, div, td, th, blockquote, pre, article, section, br``),
  whitespace-collapsed, entity-decoded, in document order.

Pure function of the input string — runs identically inside the Arrow
batch stage and the golden generator.
"""

from __future__ import annotations

import re

_DROP_CONTENT = {"script", "style", "template", "noscript", "svg"}
_BOILERPLATE_TAGS = {"nav", "header", "footer", "aside", "form", "button"}
_BOILERPLATE_TOKEN = re.compile(
    r"\b(nav|menu|sidebar|side-bar|footer|header|banner|cookie|consent|"
    r"advert|ads?|promo|social|share|breadcrumbs?|pagination|comment)\b",
    re.IGNORECASE,
)
_BLOCK_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "div", "td", "th",
    "blockquote", "pre", "article", "section", "main", "ul", "ol", "table",
    "tr", "br", "title",
}
_VOID_TAGS = {"br", "hr", "img", "input", "meta", "link", "wbr", "area",
              "base", "col", "embed", "source", "track"}

_TAG_RE = re.compile(
    r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<!DOCTYPE[^>]*>|"
    r"</?([a-zA-Z][a-zA-Z0-9-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)/?>",
    re.DOTALL,
)
_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]+)")

_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "mdash": "—", "ndash": "–", "hellip": "…",
    "copy": "©", "rsquo": "’", "lsquo": "‘",
    "rdquo": "”", "ldquo": "“",
}


def _decode_entities(s: str) -> str:
    def sub(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            try:
                return chr(int(body[2:], 16))
            except ValueError:
                return m.group(0)
        if body.startswith("#"):
            try:
                return chr(int(body[1:]))
            except ValueError:
                return m.group(0)
        return _ENTITIES.get(body, m.group(0))
    return re.sub(r"&(#?[xX]?[0-9a-zA-Z]+);", sub, s)


def _is_boilerplate(tag: str, attrs: str) -> bool:
    if tag in _BOILERPLATE_TAGS:
        return True
    for name, val in _ATTR_RE.findall(attrs or ""):
        if name.lower() in ("class", "id", "role") and _BOILERPLATE_TOKEN.search(val):
            return True
    return False


def extract_blocks(html: str) -> list[str]:
    """Strip boilerplate; return main-content text blocks in document order."""
    blocks: list[str] = []
    buf: list[str] = []
    # stacks of tags we are suppressing under
    drop_stack: list[str] = []

    def flush() -> None:
        text = _decode_entities("".join(buf))
        text = re.sub(r"\s+", " ", text).strip()
        buf.clear()
        if text:
            blocks.append(text)

    pos = 0
    for m in _TAG_RE.finditer(html):
        if not drop_stack and m.start() > pos:
            buf.append(html[pos:m.start()])
        pos = m.end()
        tag = (m.group(1) or "").lower()
        if not tag:  # comment / doctype / cdata
            continue
        raw = m.group(0)
        closing = raw.startswith("</")
        self_closing = raw.endswith("/>") or tag in _VOID_TAGS
        attrs = m.group(2) or ""

        if closing:
            if drop_stack:
                if drop_stack[-1] == tag:
                    drop_stack.pop()
                continue
            if tag in _BLOCK_TAGS:
                flush()
            continue

        if drop_stack:
            if not self_closing and (tag in _DROP_CONTENT
                                     or _is_boilerplate(tag, attrs)
                                     or tag == drop_stack[-1]):
                drop_stack.append(tag)
            continue

        if tag in _DROP_CONTENT or _is_boilerplate(tag, attrs):
            flush()
            if not self_closing:
                drop_stack.append(tag)
            continue
        if tag in _BLOCK_TAGS:
            flush()
    if not drop_stack and pos < len(html):
        buf.append(html[pos:])
    flush()
    return blocks
