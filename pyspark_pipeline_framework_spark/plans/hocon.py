"""Dependency-free HOCON-subset parser for pipeline config files.

The reference's entire config layer is HOCON parsed by ``dataconf``
(reference: core/config/loader.py:14-27; examples/*.conf). This module
parses the subset those configs actually use, so `.conf` pipelines can
be loaded without any third-party parser:

- root object with or without braces; nested objects and lists
- ``key: value``, ``key = value``, and ``key { ... }`` (implicit object)
- optional commas (newline-separated members)
- ``#`` and ``//`` comments
- quoted strings, triple-quoted (``\"\"\"...\"\"\"``) strings, and
  unquoted scalars coerced to bool/null/int/float where unambiguous
- quoted keys stay literal (``"spark.sql.shuffle.partitions"``);
  unquoted dotted keys expand to nested objects (``a.b.c: 1``)
- duplicate object keys deep-merge (later scalars win) — HOCON merge
- full-value ``${a.b}`` / ``${?a.b}`` substitutions resolved against
  the root after parsing (optional form resolves to None if missing)

NOT supported (loud errors, not silent misparses): ``include``,
string/array concatenation with substitutions, ``+=``.
"""

from __future__ import annotations

from typing import Any

__all__ = ["HoconError", "loads", "load"]


class HoconError(ValueError):
    pass


class _Parser:
    def __init__(self, text: str):
        self.s = text
        self.n = len(text)
        self.i = 0

    # -- low-level -----------------------------------------------------
    def _err(self, msg: str) -> HoconError:
        line = self.s.count("\n", 0, self.i) + 1
        return HoconError(f"line {line}: {msg}")

    def skip_ws(self, newlines: bool = True) -> None:
        while self.i < self.n:
            c = self.s[self.i]
            if c == "#" or self.s.startswith("//", self.i):
                nl = self.s.find("\n", self.i)
                self.i = self.n if nl < 0 else nl
            elif c == "\n":
                if not newlines:
                    return
                self.i += 1
            elif c.isspace():
                self.i += 1
            else:
                return

    def at(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    # -- grammar -------------------------------------------------------
    def parse_root(self) -> dict[str, Any]:
        self.skip_ws()
        if self.at() == "{":
            obj = self.parse_object()
        else:
            obj = self.parse_members(root=True)
        self.skip_ws()
        if self.i < self.n:
            raise self._err(f"trailing content: {self.s[self.i:self.i+20]!r}")
        return obj

    def parse_object(self) -> dict[str, Any]:
        assert self.at() == "{"
        self.i += 1
        obj = self.parse_members(root=False)
        if self.at() != "}":
            raise self._err("expected '}'")
        self.i += 1
        return obj

    def parse_members(self, root: bool) -> dict[str, Any]:
        obj: dict[str, Any] = {}
        while True:
            self.skip_ws()
            if self.i >= self.n:
                if root:
                    return obj
                raise self._err("unexpected end of input inside object")
            if self.at() == "}":
                if root:
                    raise self._err("unexpected '}' at root")
                return obj
            key_path = self.parse_key()
            self.skip_ws(newlines=False)
            c = self.at()
            if c == "{":
                value: Any = self.parse_object()
            elif c in (":", "="):
                self.i += 1
                self.skip_ws(newlines=False)
                value = self.parse_value()
            elif c == "+" and self.s.startswith("+=", self.i):
                raise self._err("'+=' is not supported by this HOCON subset")
            else:
                raise self._err(f"expected ':', '=' or '{{' after key {key_path!r}")
            _assign(obj, key_path, value)
            self.skip_ws(newlines=False)
            if self.at() == ",":
                self.i += 1

    def parse_key(self) -> list[str]:
        if self.at() == '"':
            return [self.parse_quoted()]  # quoted keys stay literal
        j = self.i
        while j < self.n and (self.s[j].isalnum() or self.s[j] in "._-"):
            j += 1
        if j == self.i:
            raise self._err(f"expected a key, found {self.s[self.i:self.i+10]!r}")
        raw = self.s[self.i : j]
        self.i = j
        if raw == "include":
            raise self._err("'include' is not supported by this HOCON subset")
        return raw.split(".")

    def parse_value(self) -> Any:
        c = self.at()
        if c == "{":
            return self.parse_object()
        if c == "[":
            return self.parse_list()
        if self.s.startswith('"""', self.i):
            return self.parse_triple()
        if c == '"':
            return self.parse_quoted()
        if self.s.startswith("${", self.i):
            return self.parse_substitution()
        return self.parse_unquoted()

    def parse_list(self) -> list[Any]:
        assert self.at() == "["
        self.i += 1
        out: list[Any] = []
        while True:
            self.skip_ws()
            if self.i >= self.n:
                raise self._err("unexpected end of input inside list")
            if self.at() == "]":
                self.i += 1
                return out
            out.append(self.parse_value())
            self.skip_ws()
            if self.at() == ",":
                self.i += 1

    def parse_triple(self) -> str:
        end = self.s.find('"""', self.i + 3)
        if end < 0:
            raise self._err('unterminated """ string')
        raw = self.s[self.i + 3 : end]
        self.i = end + 3
        return raw

    def parse_quoted(self) -> str:
        assert self.at() == '"'
        out: list[str] = []
        j = self.i + 1
        while j < self.n:
            c = self.s[j]
            if c == '"':
                self.i = j + 1
                return "".join(out)
            if c == "\\":
                if j + 1 >= self.n:
                    break
                esc = self.s[j + 1]
                mapped = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "/": "/"}.get(esc)
                if mapped is None:
                    raise self._err(f"unsupported escape \\{esc}")
                out.append(mapped)
                j += 2
            elif c == "\n":
                break
            else:
                out.append(c)
                j += 1
        raise self._err("unterminated quoted string")

    def parse_substitution(self) -> "_Subst":
        assert self.s.startswith("${", self.i)
        end = self.s.find("}", self.i)
        if end < 0:
            raise self._err("unterminated ${...} substitution")
        body = self.s[self.i + 2 : end].strip()
        self.i = end + 1
        optional = body.startswith("?")
        path = (body[1:] if optional else body).strip()
        if not path:
            raise self._err("empty substitution path")
        self.skip_ws(newlines=False)
        if self.at() not in ("", "\n", ",", "}", "]", "#") and not self.s.startswith(
            "//", self.i
        ):
            raise self._err("substitution concatenation is not supported by this subset")
        return _Subst(path.split("."), optional)

    def parse_unquoted(self) -> Any:
        j = self.i
        while j < self.n and self.s[j] not in "\n,}]#" and not self.s.startswith("//", j):
            j += 1
        raw = self.s[self.i : j].strip()
        self.i = j
        if not raw:
            raise self._err("expected a value")
        return _coerce(raw)


class _Subst:
    def __init__(self, path: list[str], optional: bool):
        self.path = path
        self.optional = optional


def _coerce(raw: str) -> Any:
    low = raw.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low == "null":
        return None
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw


def _assign(obj: dict[str, Any], path: list[str], value: Any) -> None:
    for part in path[:-1]:
        nxt = obj.get(part)
        if not isinstance(nxt, dict):
            nxt = {}
            obj[part] = nxt
        obj = nxt
    leaf = path[-1]
    old = obj.get(leaf)
    if isinstance(old, dict) and isinstance(value, dict):
        _merge(old, value)
    else:
        obj[leaf] = value


def _merge(dst: dict[str, Any], src: dict[str, Any]) -> None:
    for k, v in src.items():
        if isinstance(dst.get(k), dict) and isinstance(v, dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


def _resolve(node: Any, root: dict[str, Any]) -> Any:
    if isinstance(node, _Subst):
        cur: Any = root
        for part in node.path:
            if not isinstance(cur, dict) or part not in cur:
                if node.optional:
                    return None
                raise HoconError(f"unresolved substitution ${{{'.'.join(node.path)}}}")
            cur = cur[part]
        if isinstance(cur, _Subst):
            cur = _resolve(cur, root)
        return cur
    if isinstance(node, dict):
        return {k: _resolve(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve(v, root) for v in node]
    return node


def loads(text: str) -> dict[str, Any]:
    """Parse a HOCON-subset document into plain dicts/lists/scalars."""
    tree = _Parser(text.lstrip("﻿")).parse_root()
    return _resolve(tree, tree)


def load(path: str) -> dict[str, Any]:
    with open(path, encoding="utf-8") as f:
        return loads(f.read())
