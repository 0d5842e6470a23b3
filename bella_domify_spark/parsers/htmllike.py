"""HTML main-content extraction: boilerplate strip + DOM heuristics → DomTree.

ENGINE EXTENSION (north-star axis): the reference routes ``.html`` through
its plain-text converter (/root/reference/services/parse_manager.py:90-95),
i.e. it performs NO boilerplate removal. The north star explicitly asks for
"HTML boilerplate strip, ... DOM heuristics" as part of main-content
extraction, so this module implements the classic readability-style
heuristics from scratch, dependency-free:

- **Tag-level strip**: ``<script> <style> <noscript> <template> <nav>
  <header> <footer> <aside> <form> <button> <select> <svg> <iframe>
  <object> <canvas> <head>`` subtrees are dropped wholesale. ``<script>``
  and ``<style>`` bodies are raw-text elements — their content is skipped up
  to the matching close tag even when it contains ``<`` markup.
- **Attribute heuristics**: an element whose ``class``/``id`` matches the
  boilerplate pattern (nav|menu|sidebar|footer|banner|comment|cookie|
  advert|promo|share|social|breadcrumb), carries ``hidden``, ``role=
  "navigation|banner|contentinfo"`` or ``display:none`` is dropped with its
  subtree.
- **Structure mapping**: ``<h1>-<h6>`` become Title nodes forming the
  heading hierarchy (same stack rule as the markdown tokenizer);
  ``<li>`` becomes a List node under the preceding paragraph; ``<pre>``
  becomes a Code node preserving inner whitespace; ``<table>`` becomes a
  real Table node (``<td>/<th>`` cells, rowspan/colspan honored) rendered
  via the shared TableBlock HTML flatten; every other block boundary
  (p/div/section/article/blockquote/tr/br...) flushes the text buffer into
  a paragraph.
- **Text cleanup**: entities decoded (named basics + numeric), whitespace
  runs collapsed, empty blocks dropped.

``parse`` never raises on malformed input: stray close tags are ignored,
unclosed boilerplate subtrees end at EOF, attributes may be unquoted.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from bella_domify_spark.core.blocks import Cell, Line, Span, TableBlock, TextBlock
from bella_domify_spark.core.tree import DomTree, Node

_TOKEN = re.compile(r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<[^>]*>|[^<]+", re.S)
_TAG = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9:-]*)")
_ATTR = re.compile(r"""([a-zA-Z-]+)\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""")
_BARE_ATTR = re.compile(r"\s(hidden)(?=[\s>/])", re.I)

#: subtrees dropped wholesale
BOILERPLATE_TAGS = frozenset({
    "script", "style", "noscript", "template", "nav", "header", "footer",
    "aside", "form", "button", "select", "option", "svg", "iframe",
    "object", "canvas", "head", "dialog", "menu",
})
#: raw-text elements: content is not markup; skip to the literal close tag
RAW_TEXT_TAGS = frozenset({"script", "style", "textarea", "title"})
#: void elements never push the skip stack
VOID_TAGS = frozenset({
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
})
#: block boundaries that flush the paragraph buffer
BLOCK_TAGS = frozenset({
    "p", "div", "section", "article", "main", "body", "html", "blockquote",
    "ul", "ol", "dl", "dt", "dd", "figure", "figcaption", "address",
    "details", "summary", "br", "hr", "tr", "caption",
})

_BOILER_ATTR = re.compile(
    r"(?:^|[\s_-])(nav|menu|sidebar|footer|banner|comments?|cookies?|"
    r"adverts?|ads?|promos?|share|social|breadcrumbs?)(?:$|[\s_-])", re.I)

#: properly closed raw-text elements are excised before tokenization — their
#: bodies may contain bare '<' (scripts compare, css comments) that would
#: otherwise derail the token stream past the close tag
_RAW_PAIR = re.compile(
    r"<(script|style|textarea|title)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_BOILER_ROLE = frozenset({"navigation", "banner", "contentinfo", "search"})
_DISPLAY_NONE = re.compile(r"display\s*:\s*none", re.I)

_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
             "nbsp": " ", "mdash": "—", "ndash": "–", "hellip": "…",
             "copy": "©", "reg": "®", "trade": "™", "laquo": "«",
             "raquo": "»", "ldquo": "“", "rdquo": "”",
             "lsquo": "‘", "rsquo": "’"}
_ENTITY = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z]+);")
_WS = re.compile(r"[ \t\r\n\f\v]+")


def decode_entities(text: str) -> str:
    def sub(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith("#"):
            try:
                code = int(body[2:], 16) if body[1] in "xX" else int(body[1:])
                # exclude UTF-16 surrogates: a lone \ud800 is a valid Python
                # str but NOT utf-8-encodable — it would kill the whole
                # Arrow batch, violating the never-fail parse contract
                if 0 < code <= 0x10FFFF and not 0xD800 <= code <= 0xDFFF:
                    return chr(code)
                return m.group(0)
            except (ValueError, OverflowError):
                return m.group(0)
        return _ENTITIES.get(body, m.group(0))

    return _ENTITY.sub(sub, text)


def _attrs_of(tag_token: str) -> dict:
    # findall yields '' (not None) for non-participating groups — `or` chains
    # double-quoted, single-quoted, bare values correctly (a genuinely empty
    # quoted value also resolves to '', which is the right answer)
    attrs = {k.lower(): (v3 or v4 or v5)
             for k, _v, v3, v4, v5 in _ATTR.findall(tag_token)}
    if _BARE_ATTR.search(tag_token):
        attrs.setdefault("hidden", "")
    return attrs


def _is_boiler_element(name: str, tag_token: str) -> bool:
    if name in BOILERPLATE_TAGS:
        return True
    attrs = _attrs_of(tag_token)
    if "hidden" in attrs:
        return True
    if attrs.get("role", "").lower() in _BOILER_ROLE:
        return True
    if _DISPLAY_NONE.search(attrs.get("style", "")):
        return True
    blob = f"{attrs.get('class', '')} {attrs.get('id', '')}"
    return bool(_BOILER_ATTR.search(blob))


# typed flat blocks: (kind, payload) where kind ∈ {heading<N>, paragraph,
# listitem, code, table}; table payload = list of rows of
# (text, rowspan, colspan)
def tokenize(html: str) -> List[Tuple[str, object]]:
    html = _RAW_PAIR.sub("", html)
    blocks: List[Tuple[str, object]] = []
    buf: List[str] = []
    # skip-stack for boilerplate subtrees: list of tag names awaiting close
    skip_stack: List[str] = []
    raw_skip: Optional[str] = None       # inside <script>/<style> raw text
    heading: Optional[int] = None        # inside <hN>
    pre_depth = 0
    li_depth = 0
    table: Optional[List[List[tuple]]] = None
    table_depth = 0
    row: Optional[List[tuple]] = None
    cell_buf: Optional[List[str]] = None
    cell_span: Tuple[int, int] = (1, 1)

    def flush(kind_hint: Optional[str] = None) -> None:
        nonlocal heading
        text = "".join(buf)
        buf.clear()
        text = text if pre_depth else _WS.sub(" ", text).strip()
        if not text.strip():
            return
        if heading is not None:
            blocks.append((f"heading{heading}", text))
            heading = None   # an unclosed <hN> claims only its own text run
        elif kind_hint == "listitem" or li_depth:
            blocks.append(("listitem", text))
        elif pre_depth:
            blocks.append(("code", text.strip("\n")))
        else:
            blocks.append(("paragraph", text))

    def close_cell() -> None:
        nonlocal cell_buf
        if row is not None and cell_buf is not None:
            text = _WS.sub(" ", "".join(cell_buf)).strip()
            row.append((text, *cell_span))
        cell_buf = None

    def close_row() -> None:
        nonlocal row
        close_cell()
        if table is not None and row:
            table.append(row)
        row = None

    for m in _TOKEN.finditer(html):
        tok = m.group(0)
        if tok.startswith("<!--") or tok.startswith("<![CDATA["):
            continue
        if not tok.startswith("<"):
            if raw_skip or skip_stack:
                continue
            text = decode_entities(tok)
            if cell_buf is not None:
                cell_buf.append(text)
            else:
                buf.append(text)
            continue

        tm = _TAG.match(tok)
        if tm is None:      # <!doctype>, <?xml?>, stray '<'
            continue
        name = tm.group(1).lower()
        closing = tok.startswith("</")
        self_closing = tok.rstrip(">").endswith("/")

        if raw_skip is not None:
            if closing and name == raw_skip:
                raw_skip = None
            continue

        if skip_stack:
            if closing:
                # close the innermost matching frame; ignore strays
                if name in skip_stack:
                    for i in range(len(skip_stack) - 1, -1, -1):
                        if skip_stack[i] == name:
                            del skip_stack[i:]
                            break
            elif name in RAW_TEXT_TAGS and not self_closing:
                raw_skip = name
            elif not self_closing and name not in VOID_TAGS:
                # EVERY nested open tag joins the frame — a same-name child
                # (<div> inside a boiler <div>) must consume its own close
                # tag, or the boiler frame would pop early and leak content
                skip_stack.append(name)
            continue

        if not closing and _is_boiler_element(name, tok):
            if name in RAW_TEXT_TAGS and not self_closing:
                raw_skip = name
            elif not self_closing and name not in VOID_TAGS:
                skip_stack.append(name)
            continue
        if not closing and name in RAW_TEXT_TAGS:
            # non-boiler raw text (textarea/title outside head): skip body
            if not self_closing:
                raw_skip = name
            continue

        if name == "table":
            if not closing:
                if table is None:
                    flush()
                    table, row, cell_buf = [], None, None
                    table_depth = 1
                else:
                    # nested table: its text flows into the parent cell —
                    # structure is flattened, content is never dropped
                    table_depth += 1
            else:
                table_depth = max(0, table_depth - 1)
                if table_depth == 0:
                    close_row()
                    # text seen at table level outside any cell — notably
                    # <caption> content — precedes the rows in source
                    # order; flush it as a paragraph BEFORE the table
                    # block so document order is preserved
                    flush()
                    if table:
                        blocks.append(("table", table))
                    table = None
            continue
        if table is not None:
            if table_depth > 1:
                # inside a nested table: tr/td act as plain separators
                if name in ("tr", "td", "th") and cell_buf is not None:
                    cell_buf.append(" ")
            elif name == "tr":
                close_row()
                if not closing:
                    row = []
            elif name in ("td", "th"):
                close_cell()
                if not closing and row is not None:
                    attrs = _attrs_of(tok)

                    def _n(v: str) -> int:
                        try:
                            return max(1, int(v))
                        except (ValueError, TypeError):
                            return 1
                    cell_span = (_n(attrs.get("rowspan", "1")),
                                 _n(attrs.get("colspan", "1")))
                    cell_buf = []
            continue

        if len(name) == 2 and name[0] == "h" and name[1].isdigit() \
                and 1 <= int(name[1]) <= 6:
            flush()
            heading = None if closing else int(name[1])
            continue
        if name == "li":
            flush("listitem" if closing else None)
            li_depth = max(0, li_depth - 1) if closing else li_depth + 1
            continue
        if name in ("ul", "ol", "dl", "menu") and closing:
            # implicitly-closed <li>s must not leak list context past the
            # list itself (an unmatched <li> would otherwise mark every
            # later paragraph in the document as a list item)
            flush("listitem" if li_depth else None)
            li_depth = 0
            continue
        if name == "pre":
            flush()
            pre_depth = max(0, pre_depth - 1) if closing else pre_depth + 1
            continue
        if name in BLOCK_TAGS:
            if name == "br":
                buf.append("\n" if pre_depth else " ")
            else:
                flush()
            continue
        # inline tags (a/span/em/strong/b/i/u/code/img/...) — keep the flow;
        # img contributes nothing (binary payloads are out of scope)

    # EOF: whatever is open flushes as its kind; table-level text
    # (<caption>) precedes the rows in source order, so flush it BEFORE
    # an unterminated table block — same ordering as the </table> path
    close_row()
    if table:
        flush()
        blocks.append(("table", table))
    flush()
    return blocks


def _block(text: str, override: Optional[str] = None,
           is_title: bool = False) -> TextBlock:
    span = Span(text=text, bbox=(0.0, 1.0, 0.0, 1.0))
    line = Line(spans=[span], bbox=(0.0, 1.0, 0.0, 1.0), list_type=0)
    return TextBlock(lines=[line], page_num=[0], is_title=is_title,
                     layout_override=override)


def _list_block(text: str) -> TextBlock:
    span = Span(text=text, bbox=(0.0, 1.0, 0.0, 1.0))
    line = Line(spans=[span], bbox=(0.0, 1.0, 0.0, 1.0),
                list_type="-", list_tag="- ")
    return TextBlock(lines=[line], page_num=[0])


def _table_block(rows: List[List[tuple]]) -> TableBlock:
    """Materialize the parsed (text, rowspan, colspan) rows into the shared
    TableBlock model, honoring spans via an occupancy walk."""
    n_rows = len(rows)
    occupied: dict = {}
    cell_rows: List[List[Cell]] = [[] for _ in range(n_rows)]
    for i, r in enumerate(rows):
        j = 0
        for text, rspan, cspan in r:
            while (i, j) in occupied:
                j += 1
            end_row = min(i + rspan, n_rows) - 1
            end_col = j + cspan - 1
            for a in range(i, end_row + 1):
                for b in range(j, end_col + 1):
                    occupied[(a, b)] = True
            cell_rows[i].append(Cell(text=text, start_row=i, end_row=end_row,
                                     start_col=j, end_col=end_col))
            j = end_col + 1
    return TableBlock(rows=cell_rows, bbox=(0.0, 1.0, 0.0, 1.0), page_num=[0])


def parse(html: str) -> DomTree:
    """Boilerplate-stripped DomTree with the markdown-family heading stack."""
    tree = DomTree()
    stack: List[Tuple[int, Node]] = [(0, tree.root)]
    last_para: Optional[Node] = None

    for kind, payload in tokenize(html):
        if kind.startswith("heading"):
            level = int(kind[len("heading"):])
            while stack[-1][0] >= level:
                stack.pop()
            node = Node(_block(payload, is_title=True))
            stack[-1][1].add_child(node)
            stack.append((level, node))
            last_para = None
        elif kind == "listitem":
            if last_para is not None:
                last_para.add_child(Node(_list_block(payload)))
            else:
                stack[-1][1].add_child(Node(_block("- " + payload)))
        elif kind == "code":
            stack[-1][1].add_child(Node(_block(payload, override="Code")))
            last_para = None
        elif kind == "table":
            stack[-1][1].add_child(Node(_table_block(payload)))
            last_para = None
        else:
            node = Node(_block(payload))
            stack[-1][1].add_child(node)
            last_para = node
    return tree


def extract_text(html: str) -> str:
    return parse(html).to_markdown()


__all__ = ["parse", "extract_text", "tokenize", "decode_entities"]
