"""Document-level text transforms (SURVEY.md §2.3), pure Python:

- html_to_markdown: /root/reference markdown/HtmlToMarkdown.java:97-202 —
  ATX headings (:179-182), ignore_tags removal (:147-154), base_uri
  absolutization of href/src (:157-173). Motivated by LLM/RAG token
  reduction (:38-40) — this is also the html->text extraction stage of the
  north-rule webpages pipeline.
- markdown_to_html: markdown/MarkdownToHtml.java:69-112 (escape_html=False
  default, :93-97).
- markdown_to_text: markdown/MarkdownToText.java:71-173 — text literals,
  soft-break -> space, hard-break -> newline, link text without URL,
  "- " list items, trailing trim (:114-165).

Implemented with stdlib html.parser + regex (no bs4/markdown libs here);
coverage targets the constructs the reference's tests exercise.
"""

from __future__ import annotations

import re
from html import escape, unescape
from html.parser import HTMLParser
from typing import Optional
from urllib.parse import urljoin

DEFAULT_IGNORE_TAGS = ["script", "style", "noscript", "head", "template"]

_HEADINGS = {f"h{i}": i for i in range(1, 7)}
_BLOCK_TAGS = {"p", "div", "section", "article", "main", "header", "footer",
               "nav", "ul", "ol", "table", "tr", "blockquote", "pre", "br",
               "hr"} | set(_HEADINGS)

# markdown specials interpreted by THIS package's md consumers; emission
# escapes them, the consumers honor the escapes via a protect/restore pass
_MD_INLINE_SPECIALS = re.compile(r"([\\*`\[\]])")
_MD_ESCAPED = re.compile(r"\\([\\*`\[\]#>+-])")
# inline code spans (CommonMark: content is VERBATIM — no escape pairs,
# no markup): 1- or 2-backtick delimiters, unescaped, double tried first.
# Consumers stash span content out-of-band (U+E001 placeholder) before
# any structural regex or protect pass touches the text.
_MD_SPAN = re.compile(
    r"(?<!\\)(?<!`)``(?!`)((?:[^`\n]|`(?!`))+?)``(?!`)"
    r"|(?<!\\)(?<!`)`(?!`)([^`\n]+?)`(?!`)")
_MD_SPAN_SLOT = re.compile("\ue001(\\d+)\ue001")


def _span_stash(spans: list):
    """Returns a _MD_SPAN.sub callback that strips delimiters (plus the
    CommonMark one-space padding rule) and swaps content for a slot."""
    def sub(m: "re.Match") -> str:
        inner = m.group(1) if m.group(1) is not None else m.group(2)
        if len(inner) >= 2 and inner[0] == " " and inner[-1] == " " \
                and inner.strip():
            inner = inner[1:-1]
        spans.append(inner)
        return "\ue001%d\ue001" % (len(spans) - 1)
    return sub
# U+E000 (private use) sentinel: original text containing U+E000 followed by
# 4 hex digits would collide — acceptable for a test/extraction helper
_MD_SENTINEL = re.compile("\ue000([0-9a-f]{4})")


def _md_protect(text: str) -> str:
    return _MD_ESCAPED.sub(lambda m: "\ue000%04x" % ord(m.group(1)), text)


def _md_restore(text: str) -> str:
    return _MD_SENTINEL.sub(lambda m: chr(int(m.group(1), 16)), text)


class _Html2Md(HTMLParser):
    def __init__(self, ignore_tags: list[str], base_uri: Optional[str]):
        super().__init__(convert_charrefs=True)
        self.ignore = set(t.lower() for t in ignore_tags)
        self.base = base_uri
        self.out: list[str] = []
        self.skip_depth = 0
        self.list_stack: list[str] = []
        self.href: Optional[str] = None
        self.link_text: list[str] = []
        self.in_pre = False
        self.bold = False
        self.italic = False
        self.code_buf: Optional[list[str]] = None

    def _emit(self, s: str) -> None:
        if self.code_buf is not None:
            # markup markers are unrepresentable inside a CommonMark code
            # span (content is literal): drop them, keep only data
            return
        (self.link_text if self.href is not None else self.out).append(s)

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in self.ignore:
            self.skip_depth += 1
            return
        if self.skip_depth:
            return
        a = dict(attrs)
        if tag in _HEADINGS:
            self.out.append("\n\n" + "#" * _HEADINGS[tag] + " ")  # ATX (:179-182)
        elif tag == "p" or tag == "div":
            self.out.append("\n\n")
        elif tag == "br":
            self._emit("  \n")
        elif tag == "hr":
            self.out.append("\n\n---\n\n")
        elif tag in ("ul", "ol"):
            self.list_stack.append(tag)
            self.out.append("\n")
        elif tag == "li":
            self.out.append("\n" + "  " * (len(self.list_stack) - 1) + "- ")
        elif tag in ("strong", "b"):
            self._emit("**")
        elif tag in ("em", "i"):
            self._emit("*")
        elif tag == "code" and not self.in_pre:
            if self.code_buf is None:
                self.code_buf = []
        elif tag == "pre":
            self.in_pre = True
            self.out.append("\n\n```\n")
        elif tag == "a":
            href = a.get("href", "")
            if self.base and href:
                href = urljoin(self.base, href)  # absolutization (:157-173)
            self.href = href
            self.link_text = []
        elif tag == "img":
            src = a.get("src", "")
            if self.base and src:
                src = urljoin(self.base, src)
            alt = a.get("alt", "")
            self._emit(f"![{alt}]({src})")

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in self.ignore:
            self.skip_depth = max(self.skip_depth - 1, 0)
            return
        if self.skip_depth:
            return
        if tag in _HEADINGS or tag in ("p", "div"):
            self.out.append("\n\n")
        elif tag in ("ul", "ol"):
            if self.list_stack:
                self.list_stack.pop()
            self.out.append("\n")
        elif tag in ("strong", "b"):
            self._emit("**")
        elif tag in ("em", "i"):
            self._emit("*")
        elif tag == "code" and not self.in_pre:
            content = "".join(self.code_buf or [])
            self.code_buf = None
            if content:
                # CommonMark span, content VERBATIM (no backslash escapes
                # inside code): single-backtick delimiters unless the
                # content itself has backticks, then double + the
                # one-space padding rule; content with `` runs falls back
                # to escaped plain text (span boundary dropped — the
                # extracted text is unchanged)
                if "`" not in content:
                    self._emit(f"`{content}`")
                elif "``" not in content:
                    pad = " " if (content.startswith("`")
                                  or content.endswith("`")) else ""
                    self._emit(f"``{pad}{content}{pad}``")
                else:
                    self._emit(_MD_INLINE_SPECIALS.sub(r"\\\1", content))
        elif tag == "pre":
            self.in_pre = False
            self.out.append("\n```\n\n")
        elif tag == "a" and self.href is not None:
            text = "".join(self.link_text).strip() or self.href
            self.out.append(f"[{text}]({self.href})")
            self.href = None
            self.link_text = []

    def handle_data(self, data):
        if self.skip_depth:
            return
        if self.in_pre:
            (self.link_text if self.href is not None
             else self.out).append(data)
            return
        if self.code_buf is not None:
            # inline code content: entity-escape & and < (the consumers
            # unescape entities), collapse whitespace, NO backslash
            # escaping — CommonMark span content is verbatim
            data = data.replace("&", "&amp;").replace("<", "&lt;")
            self.code_buf.append(re.sub(r"\s+", " ", data))
            return
        # entity-escape & and < on emission: markdown treats entities as
        # live (markdown_to_text unescapes them), so raw text containing
        # '&amp;' or '<' would be double-unescaped / parsed as markup
        # downstream, breaking html -> md -> text byte identity
        data = data.replace("&", "&amp;").replace("<", "&lt;")
        # backslash-escape the markdown specials this package's own md
        # consumers interpret (commonmark-legal anywhere): inline specials
        # everywhere, block starters only at a line start
        data = _MD_INLINE_SPECIALS.sub(r"\\\1", data)
        data = re.sub(r"\s+", " ", data)
        buf = self.link_text if self.href is not None else self.out
        tail = "".join(buf[-2:])
        if not tail or tail.endswith("\n"):
            data = re.sub(r"^( ?)([#>+]|-(?=[ \t]))", r"\1\\\2", data)
        self._emit(data)


def html_to_markdown(html: str, ignore_tags: Optional[list[str]] = None,
                     base_uri: Optional[str] = None) -> str:
    parser = _Html2Md(ignore_tags if ignore_tags is not None else DEFAULT_IGNORE_TAGS,
                      base_uri)
    parser.feed(html)
    parser.close()
    md = "".join(parser.out)
    md = re.sub(r"[ \t]+\n", "\n", md)
    md = re.sub(r"\n{3,}", "\n\n", md)
    return md.strip()


# ---------------------------------------------------------------------------


def markdown_to_html(md: str, escape_html: bool = False) -> str:
    """CommonMark-subset renderer: headings, emphasis, code, links, lists,
    paragraphs (MarkdownToHtml.java:69-112)."""
    lines = md.split("\n")
    out: list[str] = []
    in_list = False
    in_code = False
    para: list[str] = []

    def flush_para():
        nonlocal para
        if para:
            out.append("<p>" + _inline(" ".join(para)) + "</p>")
            para = []

    def _inline(s: str) -> str:
        # code spans first, stashed out-of-band (content is VERBATIM —
        # no escape pairs, no emphasis inside; and emphasis ACROSS a span
        # still works because the placeholder is plain text to the
        # regexes). Then backslash-escaped specials are protected from
        # the regexes below and restored bare at the end.
        spans: list[str] = []
        s = _MD_SPAN.sub(_span_stash(spans), s)
        s = _md_protect(s)
        if escape_html:
            s = escape(s)
        s = re.sub(r"!\[([^\]]*)\]\(([^)]*)\)", r'<img src="\2" alt="\1" />', s)
        s = re.sub(r"\[([^\]]+)\]\(([^)]*)\)", r'<a href="\2">\1</a>', s)
        s = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", s)
        s = re.sub(r"\*([^*]+)\*", r"<em>\1</em>", s)
        s = re.sub(r"`([^`]+)`", r"<code>\1</code>", s)
        s = _md_restore(s)
        return _MD_SPAN_SLOT.sub(
            lambda m: "<code>%s</code>" % (
                escape(spans[int(m.group(1))]) if escape_html
                else spans[int(m.group(1))]), s)

    for line in lines:
        if line.startswith("```"):
            if in_code:
                out.append("</code></pre>")
            else:
                flush_para()
                out.append("<pre><code>")
            in_code = not in_code
            continue
        if in_code:
            out.append(escape(line))
            continue
        m = re.match(r"^(#{1,6})\s+(.*)$", line)
        if m:
            flush_para()
            if in_list:
                out.append("</ul>")
                in_list = False
            level = len(m.group(1))
            out.append(f"<h{level}>{_inline(m.group(2).strip())}</h{level}>")
            continue
        m = re.match(r"^\s*[-*]\s+(.*)$", line)
        if m:
            flush_para()
            if not in_list:
                out.append("<ul>")
                in_list = True
            out.append(f"<li>{_inline(m.group(1))}</li>")
            continue
        if not line.strip():
            flush_para()
            if in_list:
                out.append("</ul>")
                in_list = False
            continue
        para.append(line.strip())
    flush_para()
    if in_list:
        out.append("</ul>")
    if in_code:
        out.append("</code></pre>")
    return "\n".join(out)


def markdown_to_text(md: str) -> str:
    """Markdown -> plain text (MarkdownToText.java:114-165): link text w/o
    URL, '- ' list items preserved, soft breaks -> space, trailing trim."""
    # code content is literal (CommonMark): inline spans are stashed
    # out-of-band BEFORE the protect pass — treating \\* inside a span as
    # an escape pair would drop the backslash — and fences are exempted
    # from both. Outside code, backslash-escaped specials are protected
    # so the structural regexes below treat them as plain text, then
    # restored after entity unescaping. Span delimiters must be UNESCAPED
    # backticks: this package's emitter writes literal backticks in
    # ordinary text as \\` (see _MD_ESCAPED), so "\\`x\\`" is escaped text,
    # not a span.
    spans: list[str] = []
    stash = _span_stash(spans)
    parts = re.split(r"(```.*?```)", md, flags=re.S)
    text = "".join(p if i % 2 else _md_protect(_MD_SPAN.sub(stash, p))
                   for i, p in enumerate(parts))
    text = re.sub(r"```.*?```", lambda m: re.sub(r"^```|```$", "", m.group(0),
                                                 flags=re.M).strip("`\n"),
                  text, flags=re.S)
    text = re.sub(r"^#{1,6}\s+", "", text, flags=re.M)
    text = re.sub(r"!\[([^\]]*)\]\([^)]*\)", r"\1", text)
    text = re.sub(r"\[([^\]]+)\]\([^)]*\)", r"\1", text)
    text = re.sub(r"\*\*([^*]+)\*\*", r"\1", text)
    text = re.sub(r"\*([^*]+)\*", r"\1", text)
    text = re.sub(r"`([^`]+)`", r"\1", text)
    text = re.sub(r"^\s*[-*]\s+", "- ", text, flags=re.M)
    text = unescape(text)
    text = _md_restore(text)
    # span content: entities are live (the emitter entity-escapes & and <
    # inside <code>), everything else is byte-verbatim
    text = _MD_SPAN_SLOT.sub(lambda m: unescape(spans[int(m.group(1))]),
                             text)
    lines = [ln.rstrip() for ln in text.split("\n")]
    out: list[str] = []
    prev_blank = True
    for ln in lines:
        if not ln:
            if not prev_blank:
                out.append("")
            prev_blank = True
        else:
            out.append(ln)
            prev_blank = False
    return "\n".join(out).strip()
