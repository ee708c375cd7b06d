"""TOON (Token-Oriented Object Notation) encoder/decoder.

Re-expresses the reference's TOON 3.0 pair
(/root/reference json/JsonToToon.java:99-759 encoder,
json/ToonToJson.java:82-619 decoder): an indentation-based compact notation
aimed at LLM token reduction. Shapes covered:

- objects: ``key: value`` lines, 2-space nesting
- inline primitive arrays: ``key[N]: v1,v2,v3`` (JsonToToon.java:295-313)
- tabular uniform-object arrays: ``key[N]{f1,f2}:`` + one CSV-ish row per
  record (:316-383 uniformity check + row emission)
- list arrays with ``- `` items for mixed content (:386-607)
- canonical no-exponent number formatting (:643-659)
- context-aware string quoting (:662-714), key quoting (:728-733)
- no trailing newline (:741-748)
"""

from __future__ import annotations

import base64
import datetime as _dt
import math
import re
from decimal import Decimal
from typing import Any

INDENT = "  "

_NEEDS_QUOTE = re.compile(r'[,:\[\]{}"#\n\\]|^\s|\s$|^$')
_NUMBERISH = re.compile(r"^-?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _fmt_number(v: float | int) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if math.isnan(v) or math.isinf(v):
        return '"' + str(v) + '"'
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    s = repr(v)
    if "e" in s or "E" in s:  # canonical no-exponent (:643-659)
        s = format(v, ".17f").rstrip("0").rstrip(".")
    return s


def _quote(s: str) -> str:
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n") + '"'


def _to_json_scalar(v: Any) -> Any:
    """Non-JSON scalars stringify like the yaml/xml sinks do: at the
    reference's JSON boundary these are already strings, and without this
    a timestamp column crashed encode (list(datetime)) while a binary
    column silently became an int array."""
    if isinstance(v, (_dt.datetime, _dt.date, _dt.time)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        try:
            return bytes(v).decode("utf-8")
        except UnicodeDecodeError:
            return base64.b64encode(bytes(v)).decode()
    if isinstance(v, Decimal):
        return str(v)
    return v


def _fmt_scalar(v: Any) -> str:
    v = _to_json_scalar(v)
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return _fmt_number(v)
    s = str(v)
    if _NEEDS_QUOTE.search(s) or _NUMBERISH.match(s) or s in ("true", "false", "null"):
        return _quote(s)
    return s


def _fmt_key(k: str) -> str:
    if _NEEDS_QUOTE.search(k) or _NUMBERISH.match(k):
        return _quote(k)
    return k


def _is_primitive(v: Any) -> bool:
    return v is None or isinstance(
        v, (bool, int, float, str, bytes, bytearray, Decimal,
            _dt.datetime, _dt.date, _dt.time))


def _tabular_fields(items: list) -> list[str] | None:
    """Uniform objects with primitive values -> shared field list (:316-383)."""
    if not items or not all(isinstance(x, dict) for x in items):
        return None
    keys = list(items[0].keys())
    for x in items:
        if list(x.keys()) != keys:
            return None
        if not all(_is_primitive(v) for v in x.values()):
            return None
    return keys if keys else None


def _encode_array(key: str | None, items: list, depth: int, out: list[str]) -> None:
    pad = INDENT * depth
    head = (f"{_fmt_key(key)}" if key is not None else "")
    if all(_is_primitive(x) for x in items):
        out.append(f"{pad}{head}[{len(items)}]: "
                   f"{','.join(_fmt_scalar(x) for x in items)}"
                   if items else f"{pad}{head}[0]:")
        return
    fields = _tabular_fields(items)
    if fields:
        out.append(f"{pad}{head}[{len(items)}]"
                   f"{{{','.join(_fmt_key(f) for f in fields)}}}:")
        for x in items:
            out.append(f"{pad}{INDENT}{','.join(_fmt_scalar(x[f]) for f in fields)}")
        return
    out.append(f"{pad}{head}[{len(items)}]:")
    for x in items:
        if _is_primitive(x):
            out.append(f"{pad}{INDENT}- {_fmt_scalar(x)}")
        elif isinstance(x, dict):
            out.append(f"{pad}{INDENT}-")
            _encode_object(x, depth + 2, out)
        else:
            out.append(f"{pad}{INDENT}-")
            _encode_array(None, list(x), depth + 2, out)


def _encode_object(obj: dict, depth: int, out: list[str]) -> None:
    pad = INDENT * depth
    for k, v in obj.items():
        if _is_primitive(v):
            out.append(f"{pad}{_fmt_key(k)}: {_fmt_scalar(v)}")
        elif isinstance(v, dict):
            if not v:
                out.append(f"{pad}{_fmt_key(k)}: {{}}")  # empty object literal
                continue
            out.append(f"{pad}{_fmt_key(k)}:")
            _encode_object(v, depth + 1, out)
        else:
            _encode_array(k, list(v), depth, out)


def encode(value: Any) -> str:
    """JSON-compatible value -> TOON text (no trailing newline, :741-748)."""
    out: list[str] = []
    if isinstance(value, dict):
        if not value:
            return "{}"
        _encode_object(value, 0, out)
    elif isinstance(value, (list, tuple)):
        _encode_array(None, list(value), 0, out)
    else:
        out.append(_fmt_scalar(value))
    return "\n".join(out)


# ---------------------------------------------------------------------------
# decoder (ToonToJson.java:184-618 analog)
# ---------------------------------------------------------------------------

_ARRAY_HEAD = re.compile(
    r'^(?P<key>"(?:[^"\\]|\\.)*"|[^:\[\]{}]*?)\[(?P<n>\d+)\]'
    r"(?:\{(?P<fields>[^}]*)\})?:(?P<rest>.*)$")


_UNESCAPE = re.compile(r"\\(.)")
_ESC_MAP = {"n": "\n", '"': '"', "\\": "\\"}


def _unquote(s: str) -> str:
    # left-to-right escape scan: sequential str.replace corrupts strings
    # like 'a\\nb' (backslash + 'n'), whose encoding '\\\\n' had its tail
    # matched by the '\\n'->newline replace
    return _UNESCAPE.sub(lambda m: _ESC_MAP.get(m.group(1), m.group(0)),
                         s[1:-1])


def _scalar(tok: str) -> Any:
    tok = tok.strip()
    if tok.startswith('"') and tok.endswith('"') and len(tok) >= 2:
        return _unquote(tok)
    if tok == "{}":
        return {}
    if tok == "null" or tok == "":
        return None
    if tok == "true":
        return True
    if tok == "false":
        return False
    if _NUMBERISH.match(tok):
        if re.fullmatch(r"-?\d+", tok):
            return int(tok)
        return float(tok)
    return tok


def _split_row(line: str) -> list[str]:
    """Split on commas outside quotes (:527-583 quoted-string handling)."""
    out, cur, in_q, esc = [], [], False, False
    for ch in line:
        if esc:
            cur.append(ch)
            esc = False
        elif ch == "\\" and in_q:
            cur.append(ch)
            esc = True
        elif ch == '"':
            cur.append(ch)
            in_q = not in_q
        elif ch == "," and not in_q:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


class _Parser:
    def __init__(self, lines: list[str]):
        self.lines = lines
        self.i = 0

    def _depth(self, line: str) -> int:
        return (len(line) - len(line.lstrip(" "))) // len(INDENT)

    def peek(self) -> str | None:
        return self.lines[self.i] if self.i < len(self.lines) else None

    def parse_block(self, depth: int) -> Any:
        """Parse an object body (or detect a root array) at given depth."""
        obj: dict[str, Any] = {}
        while True:
            line = self.peek()
            if line is None or self._depth(line) < depth or not line.strip():
                break
            m = _ARRAY_HEAD.match(line.strip())
            if m is not None:
                self.i += 1
                key = m.group("key")
                val = self._parse_array(m, depth)
                if key == "":
                    return val  # root / anonymous array
                obj[_scalar_key(key)] = val
                continue
            stripped = line.strip()
            key, _, rest = _partition_key(stripped)
            self.i += 1
            if rest.strip():
                obj[key] = _scalar(rest)
            else:
                nxt = self.peek()
                if nxt is not None and self._depth(nxt) > depth:
                    obj[key] = self.parse_block(depth + 1)
                else:
                    obj[key] = None
        return obj

    def _parse_array(self, m: re.Match, depth: int) -> list:
        n = int(m.group("n"))
        fields = m.group("fields")
        rest = m.group("rest").strip()
        if fields is not None:  # tabular
            names = [_scalar_key(f.strip()) for f in _split_row(fields)]
            rows = []
            for j in range(n):
                line = self.peek()
                if line is None:
                    # truncated input: a parse error, not a bare IndexError
                    raise ValueError(
                        f"TOON: tabular array declares {n} rows but input "
                        f"ends after {j}")
                self.i += 1
                toks = _split_row(line.strip())
                rows.append({k: _scalar(t) for k, t in zip(names, toks)})
            return rows
        if rest or n == 0:  # inline primitives
            if not rest:
                return []
            return [_scalar(t) for t in _split_row(rest)]
        items = []
        for _ in range(n):
            line = self.peek()
            if line is None:
                break
            stripped = line.strip()
            if stripped == "-":
                self.i += 1
                items.append(self.parse_block(self._depth(line) + 1))
            elif stripped.startswith("- "):
                self.i += 1
                items.append(_scalar(stripped[2:]))
            else:
                break
        return items


def _partition_key(line: str) -> tuple[str, str, str]:
    if line.startswith('"'):
        m = re.match(r'^("(?:[^"\\]|\\.)*")\s*:\s?(.*)$', line)
        if m:
            return _unquote(m.group(1)), ":", m.group(2)
    k, sep, rest = line.partition(":")
    return k.strip(), sep, rest[1:] if rest.startswith(" ") else rest


def _scalar_key(k: str) -> str:
    k = k.strip()
    if k.startswith('"') and k.endswith('"') and len(k) >= 2:
        return _unquote(k)
    return k


def decode(text: str) -> Any:
    lines = [ln for ln in text.split("\n") if ln.strip() != ""]
    if not lines:
        return None
    first = lines[0].strip()
    if len(lines) == 1 and first == "{}":
        return {}
    if len(lines) == 1 and re.fullmatch(r'"(?:[^"\\]|\\.)*"', first):
        return _scalar(first)  # root quoted-string scalar (may contain ':')
    if len(lines) == 1 and ":" not in first and not _ARRAY_HEAD.match(first):
        return _scalar(first)
    return _Parser(lines).parse_block(0)
