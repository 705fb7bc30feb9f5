"""Minimal DOM on top of the stdlib ``html.parser``.

The container has no bs4/lxml, so the extraction stages (SURVEY.md §2.3
P1-P7) parse HTML with this module. Semantics intentionally mirror the
subset of BeautifulSoup behaviour the reference relies on:

- ``Node.text`` concatenates all descendant text nodes with no separator
  (bs4 ``Tag.text``); character references are decoded by the stdlib
  parser (``convert_charrefs=True``).
- class matching is whitespace-token based (``class="a b"`` matches both).
- void elements (``input``, ``br``, ...) never take children.

This is a from-scratch implementation; the reference uses
``BeautifulSoup(html, "html.parser")`` (e.g. /root/reference/siren/scrapers/
online/mirror.py:66) which wraps the same stdlib tokenizer, so text-node
decoding behaviour matches by construction.
"""

from __future__ import annotations

from html.parser import HTMLParser

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str | None], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[object] = []  # Node | str
        self.parent = parent

    # -- querying ---------------------------------------------------------
    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    @property
    def classes(self) -> list[str]:
        c = self.attrs.get("class")
        return c.split() if c else []

    def has_class(self, *names: str) -> bool:
        cs = self.classes
        return all(n in cs for n in names)

    def iter_desc(self):
        """Yield all descendant element nodes, document order."""
        stack = [c for c in reversed(self.children) if isinstance(c, Node)]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(c for c in reversed(node.children) if isinstance(c, Node))

    def _match(self, tag: str | None, class_: str | None, id_: str | None,
               attrs: dict | None) -> bool:
        if tag is not None and self.tag != tag:
            return False
        if class_ is not None and not self.has_class(*class_.split()):
            return False
        if id_ is not None and self.attrs.get("id") != id_:
            return False
        if attrs:
            for k, v in attrs.items():
                if self.attrs.get(k) != v:
                    return False
        return True

    def find(self, tag=None, class_=None, id_=None, attrs=None) -> "Node | None":
        for node in self.iter_desc():
            if node._match(tag, class_, id_, attrs):
                return node
        return None

    def find_all(self, tag=None, class_=None, id_=None, attrs=None) -> list["Node"]:
        return [n for n in self.iter_desc() if n._match(tag, class_, id_, attrs)]

    def child_elements(self) -> list["Node"]:
        return [c for c in self.children if isinstance(c, Node)]

    def first_child(self, tag: str) -> "Node | None":
        for c in self.children:
            if isinstance(c, Node) and c.tag == tag:
                return c
        return None

    def extract(self) -> None:
        """Detach this node from its parent (bs4 ``Tag.extract``)."""
        if self.parent is not None:
            self.parent.children = [c for c in self.parent.children if c is not self]
            self.parent = None

    @property
    def text(self) -> str:
        out: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                out.append(c)
            else:
                stack.extend(reversed(c.children))
        return "".join(out)

    def __repr__(self) -> str:  # debugging aid
        return f"<{self.tag} {self.attrs}>"


class _Builder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # close the innermost matching open tag (lenient, like html.parser)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str | bytes) -> Node:
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    b = _Builder()
    b.feed(html)
    b.close()
    return b.root
