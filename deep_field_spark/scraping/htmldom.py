"""Minimal tolerant HTML tree ("DOM-lite") on the stdlib HTMLParser.

The container has no bs4/lxml, so the parse UDFs use this instead. It
supports exactly the navigation surface the page extractors need —
``find``/``find_all`` (doc order, recursive or direct-children),
``text`` (concatenated descendant strings, entity-decoded), attribute
access — mirroring the BeautifulSoup calls the reference makes
(/root/reference/deepfield/scraping/bbref_pages.py) without porting any
of its code. sports-reference pages are template-generated and close
their tags; recovery here is limited to void elements and
pop-to-matching end tags, which is sufficient for the fixture corpus
(verified by the golden tests).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    """An element node; children are Nodes and raw strings (text)."""

    __slots__ = ("name", "attrs", "children")

    def __init__(self, name: str, attrs: dict[str, str | None]):
        self.name = name
        self.attrs = attrs
        self.children: list[Node | str] = []

    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    def __getitem__(self, key: str):
        return self.attrs[key]

    def has_attr(self, key: str) -> bool:
        return key in self.attrs

    @property
    def text(self) -> str:
        out: list[str] = []
        stack: list[Node | str] = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                out.append(c)
            else:
                stack.extend(reversed(c.children))
        return "".join(out)

    def _matches(self, name: str | None, attrs: dict | None,
                 fn: Callable[["Node"], bool] | None) -> bool:
        if name is not None and self.name != name:
            return False
        if attrs:
            for k, v in attrs.items():
                mine = self.attrs.get(k)
                if mine is None:
                    return False
                if k == "class":
                    # class is multi-valued: match any token
                    if v not in (mine or "").split():
                        return False
                elif mine != v:
                    return False
        if fn is not None and not fn(self):
            return False
        return True

    def descendants(self) -> Iterator["Node"]:
        """All element descendants, document order."""
        stack: list[Node | str] = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, Node):
                yield c
                stack.extend(reversed(c.children))

    def find_all(self, name: str | None = None, attrs: dict | None = None,
                 fn: Callable[["Node"], bool] | None = None,
                 recursive: bool = True, limit: int | None = None) -> list["Node"]:
        it = self.descendants() if recursive else (
            c for c in self.children if isinstance(c, Node)
        )
        out: list[Node] = []
        for node in it:
            if node._matches(name, attrs, fn):
                out.append(node)
                if limit is not None and len(out) >= limit:
                    break
        return out

    def find(self, name: str | None = None, attrs: dict | None = None,
             fn: Callable[["Node"], bool] | None = None,
             recursive: bool = True) -> "Node | None":
        found = self.find_all(name, attrs, fn, recursive=recursive, limit=1)
        return found[0] if found else None


class _TreeBuilder(HTMLParser):
    # Tags that auto-close an open element of the same name (enough
    # recovery for template-generated sports pages).
    _SELF_NESTING = frozenset({"p", "li", "tr", "td", "th", "option"})

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        if tag in VOID_ELEMENTS:
            self.stack[-1].children.append(Node(tag, dict(attrs)))
            return
        if tag in self._SELF_NESTING and self.stack[-1].name == tag:
            self.stack.pop()
        node = Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str) -> Node:
    builder = _TreeBuilder()
    builder.feed(html)
    return builder.root
