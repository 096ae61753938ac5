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
- ``${a.b}`` / ``${?a.b}`` substitutions resolved against the root
  AFTER parsing and all includes, with the environment as fallback for
  paths not in the file (HOCON env-variable rule); substitution chains
  and substituted objects that themselves contain substitutions
  resolve recursively, with cycle detection. NOTE: env-fallback values
  are raw **strings** (no bool/int/float coercion, matching HOCON —
  the env has no types), while file values are coerced; config
  consumers expecting ints from ``${PORT}``-style overrides should
  validate/convert downstream (the schema ``_check_types`` helpers do)
- missing ``${?optional}`` follows the spec: the FIELD IS OMITTED (not
  null), a list element vanishes, a string-concat part becomes empty;
  ``key = value`` then ``key = ${?maybe}`` keeps the previous value
  when the substitution is undefined (the env-override idiom)
- root-level **self-referential substitution** sees the key's previous
  value: ``path = ${path}":/bin"``, ``a = ${a} [2]``,
  ``a = ${a} {extra: 1}``, and duplicate-object chains like
  ``a { xs = ${a.xs} [2] }``; a self-reference with NO previous value
  is a loud unresolved-substitution/cycle error, and self-references
  nested below a non-root object literal are out of subset (loud
  cycle error)
- value concatenation: ``"jdbc://"${host}":"${port}``, ``${base}/sub``,
  list concat ``${defaults} [x]``, object concat ``${base} {k: v}``;
  interior whitespace between tokens is preserved (HOCON string-
  concatenation rule). Numeric parts render via ``str()`` — ``1.50``
  concatenated renders as ``1.5``
- ``include "path"`` / ``include file("path")`` /
  ``include required(file("path"))`` — paths resolve relative to the
  including file; a missing non-required include merges nothing
  (HOCON semantics); include cycles are detected

- ``key += value`` self-referential append (sugar for
  ``key = ${?key} [value]``): appends to the key's current list across
  duplicate-key merges and includes; a missing key starts a new list; a
  substitution base (``a = ${defaults}`` then ``a += x``) concatenates
  at resolve time; appending to a non-list is a loud error
- triple-quoted strings follow the HOCON quirk: the string ends at the
  LAST of a run of closing quotes (extra trailing quotes belong to the
  string)

NOT supported (loud errors, not silent misparses):
``include url(...)`` / ``classpath(...)``.
"""

from __future__ import annotations

import copy
import os
from typing import Any

__all__ = ["HoconError", "loads", "load"]


class _Missing:
    """Sentinel for a missing ``${?optional}`` substitution — distinct
    from an explicit ``null``: per the HOCON spec the FIELD is omitted,
    a list element vanishes, and string concatenation drops the part."""

    __repr__ = lambda self: "<missing>"  # noqa: E731


_MISSING = _Missing()


class HoconError(ValueError):
    pass


class _Parser:
    def __init__(self, text: str, base_dir: str | None = None, seen_files: frozenset[str] = frozenset()):
        self.s = text
        self.n = len(text)
        self.i = 0
        self.base_dir = base_dir
        self.seen_files = seen_files

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
            obj = self.parse_object(absolute=True)
        else:
            obj = self.parse_members(root=True, absolute=True)
        self.skip_ws()
        if self.i < self.n:
            raise self._err(f"trailing content: {self.s[self.i:self.i+20]!r}")
        return obj

    def parse_object(self, absolute: bool = False) -> dict[str, Any]:
        assert self.at() == "{"
        self.i += 1
        obj = self.parse_members(root=False, absolute=absolute)
        if self.at() != "}":
            raise self._err("expected '}'")
        self.i += 1
        return obj

    def parse_members(self, root: bool, absolute: bool = False) -> dict[str, Any]:
        # `absolute` = these members sit at the document root, so an
        # assign path here IS the substitution-visible absolute path —
        # the precondition for HOCON self-referential substitution
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
            if self._at_include():
                included = self.parse_include()
                if included:
                    _merge(obj, included, prefix=[] if absolute else None)
                self.skip_ws(newlines=False)
                if self.at() == ",":
                    self.i += 1
                continue
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
                # `key += v` is HOCON sugar for `key = ${?key} [v]` —
                # parsed into an _Append node so the self-reference
                # combines correctly across duplicate-key merges
                self.i += 2
                self.skip_ws(newlines=False)
                value = _Append([self.parse_value()])
            else:
                raise self._err(f"expected ':', '=' or '{{' after key {key_path!r}")
            _assign(obj, key_path, value, absolute=absolute)
            self.skip_ws(newlines=False)
            if self.at() == ",":
                self.i += 1

    def _at_include(self) -> bool:
        """``include`` is a directive only when followed by a resource
        spec (quoted path or file()/required()/url() wrapper) — an
        ``include:`` / ``include =`` / ``include {`` member keeps being
        an ordinary key named "include"."""
        if not self.s.startswith("include", self.i):
            return False
        j = self.i + len("include")
        if j < self.n and (self.s[j].isalnum() or self.s[j] in "._-"):
            return False  # longer identifier, e.g. include_path
        while j < self.n and self.s[j] in " \t":
            j += 1
        return j < self.n and (self.s[j] == '"' or self.s[j].isalpha())

    def parse_include(self) -> dict[str, Any]:
        self.i += len("include")
        self.skip_ws(newlines=False)
        required = False
        if self.s.startswith("required(", self.i):
            required = True
            self.i += len("required(")
            self.skip_ws(newlines=False)
        wrapped_file = False
        if self.s.startswith("file(", self.i):
            wrapped_file = True
            self.i += len("file(")
            self.skip_ws(newlines=False)
        elif self.at() != '"':
            raise self._err(
                "only quoted-path and file(...) includes are supported "
                "(url/classpath are not)"
            )
        path = self.parse_quoted()
        for _ in range(int(wrapped_file) + int(required)):
            self.skip_ws(newlines=False)
            if self.at() != ")":
                raise self._err("expected ')' closing include wrapper")
            self.i += 1
        if not os.path.isabs(path):
            path = os.path.join(self.base_dir or os.getcwd(), path)
        real = os.path.realpath(path)
        if real in self.seen_files:
            raise self._err(f"include cycle: {path}")
        if not os.path.exists(real):
            if required:
                raise self._err(f"required include not found: {path}")
            return {}
        with open(real, encoding="utf-8") as f:
            text = f.read()
        # parse WITHOUT resolving: substitutions in included files see
        # the full root after all includes merge (HOCON resolution order)
        sub = _Parser(
            text.lstrip("﻿"),
            base_dir=os.path.dirname(real),
            seen_files=self.seen_files | {real},
        )
        return sub.parse_root()

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
        return raw.split(".")

    def parse_value(self) -> Any:
        """A value is one token or a same-line concatenation of tokens
        (``"jdbc://"${host}":"${port}``, ``${base}/path``, ``${xs} [4]``).
        Whitespace BETWEEN tokens is captured and preserved in string
        concatenation (HOCON rule)."""
        parts = [self.parse_single_value()]
        seps: list[str] = []
        while True:
            j = self.i
            while j < self.n and self.s[j] in " \t":
                j += 1
            if j >= self.n:
                break
            c = self.s[j]
            if c in "\n,}]#" or self.s.startswith("//", j):
                break
            seps.append(self.s[self.i : j])
            self.i = j
            parts.append(self.parse_single_value())
        if len(parts) == 1:
            return parts[0]
        return _Concat(parts, seps)

    def parse_single_value(self) -> Any:
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
        # HOCON quirk: with >3 closing quotes, the extras belong to the
        # string — it terminates at the LAST three of the run
        while end + 3 < self.n and self.s[end + 3] == '"':
            end += 1
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
                if esc == "u":
                    # JSON \uXXXX escape (HOCON strings are JSON strings);
                    # surrogate pairs combine like json.loads does
                    if j + 6 > self.n:
                        raise self._err("truncated \\u escape")
                    try:
                        cp = int(self.s[j + 2 : j + 6], 16)
                    except ValueError:
                        raise self._err(
                            f"invalid \\u escape \\u{self.s[j + 2:j + 6]}"
                        ) from None
                    j += 6
                    if 0xD800 <= cp <= 0xDBFF and self.s[j : j + 2] == "\\u":
                        try:
                            lo = int(self.s[j + 2 : j + 6], 16)
                        except ValueError:
                            lo = -1
                        if 0xDC00 <= lo <= 0xDFFF:
                            cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                            j += 6
                    out.append(chr(cp))
                    continue
                mapped = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\",
                          "/": "/", "b": "\b", "f": "\f"}.get(esc)
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
        return _Subst(path.split("."), optional)

    def parse_unquoted(self) -> Any:
        j = self.i
        while (
            j < self.n
            and self.s[j] not in "\n,}]#"
            and not self.s.startswith("//", j)
            and not self.s.startswith("${", j)
        ):
            j += 1
        # leave trailing inline whitespace unconsumed so a following
        # token sees it as the concatenation separator
        while j > self.i and self.s[j - 1] in " \t":
            j -= 1
        raw = self.s[self.i : j].strip()
        self.i = j
        if not raw:
            raise self._err("expected a value")
        return _coerce(raw)


class _Subst:
    def __init__(self, path: list[str], optional: bool):
        self.path = path
        self.optional = optional


class _Concat:
    def __init__(self, parts: list[Any], seps: list[str], is_append: bool = False):
        self.parts = parts
        self.seps = seps  # len(parts) - 1 inter-token whitespace runs
        # True when built from a deferred `+=` over a substitution base:
        # the base MUST resolve to a list (or stay missing) — anything
        # else is the documented loud error, never string concatenation
        self.is_append = is_append


class _Fallback:
    """``key = <prev>`` later overridden by ``key = ${?maybe}``: per the
    HOCON spec the field KEEPS its previous value when the optional
    substitution is undefined (the standard env-override idiom)."""

    def __init__(self, prev: Any, sub: "_Subst"):
        self.prev = prev
        self.sub = sub


class _Append:
    """Pending `+=` items: combined with the key's existing value at
    assign/merge time (list → extend, _Append → chain, substitution →
    resolve-time list concat); a still-unclaimed _Append resolves to a
    fresh list (the `${?key}`-is-missing case)."""

    def __init__(self, items: list[Any]):
        self.items = items


def _type_name(v: Any) -> str:
    """User-facing type description — never leaks internal node-class
    names (``_Fallback``/``_Subst``/...) into error messages."""
    if v is None:
        return "null"
    return {
        _Subst: "substitution",
        _Concat: "value concatenation",
        _Fallback: "optional-substitution override",
        _Append: "'+=' append",
    }.get(type(v), type(v).__name__)


def _combine_append(old: Any, app: "_Append") -> Any:
    if old is _MISSING:
        return app
    if isinstance(old, _Append):
        return _Append(old.items + app.items)
    if isinstance(old, list):
        return old + app.items
    if isinstance(old, (_Subst, _Concat, _Fallback)):
        # defer: ${base} [items] — list concatenation at resolve time,
        # tagged so a non-list base raises instead of string-joining.
        # _Fallback covers the env-override-then-append idiom
        # (`a = [1]; a = ${?ENV}; a += 2`).
        return _Concat([old, app], seps=[" "], is_append=True)
    raise HoconError(f"'+=' requires a list target, found {_type_name(old)}")


def _snapshot_self(value: Any, path: list[str], old: Any) -> Any:
    """HOCON self-referential substitution: in a root-level
    ``key = ...${key}...`` the substitution sees the key's PREVIOUS
    value (spec §self-referential substitutions; the mechanism behind
    ``path = ${path}":/bin"`` and ``a = ${a} {extra: ...}``). Replaces
    matching substitution nodes in the value expression with a deep
    snapshot of the old value; a missing old value leaves the node for
    normal resolution (optional → omitted, required → loud error).
    Dict values are NOT descended — an inner-object self-reference is
    out of subset and fails loudly as a substitution cycle."""
    if isinstance(value, _Subst) and value.path == path:
        # _MISSING = no previous value at all; an explicit ``null``
        # previous value IS a value per the spec (so `a = null;
        # a = ${a} "x"` concatenates to "null x", not a cycle error)
        return copy.deepcopy(old) if old is not _MISSING else value
    if isinstance(value, _Concat):
        return _Concat(
            [_snapshot_self(p, path, old) for p in value.parts],
            value.seps,
            value.is_append,
        )
    if isinstance(value, _Append):
        return _Append([_snapshot_self(v, path, old) for v in value.items])
    if isinstance(value, list):
        return [_snapshot_self(v, path, old) for v in value]
    return value


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


def _assign(obj: dict[str, Any], path: list[str], value: Any, absolute: bool = False) -> None:
    for part in path[:-1]:
        nxt = obj.get(part)
        if not isinstance(nxt, dict):
            nxt = {}
            obj[part] = nxt
        obj = nxt
    leaf = path[-1]
    # key-presence, not `is not None`: an explicit null previous value
    # is still a previous value (spec previous-value semantics)
    old = obj[leaf] if leaf in obj else _MISSING
    if absolute:
        value = _snapshot_self(value, path, old)
    if isinstance(value, _Append):
        obj[leaf] = _combine_append(old, value)
    elif isinstance(old, dict) and isinstance(value, dict):
        _merge(old, value, prefix=path if absolute else None)
    elif isinstance(value, _Subst) and value.optional and old is not _MISSING:
        obj[leaf] = _Fallback(old, value)
    else:
        obj[leaf] = value


def _merge(dst: dict[str, Any], src: dict[str, Any], prefix: list[str] | None = None) -> None:
    # `prefix` = absolute path of dst when known (root-level merges) —
    # enables previous-value snapshots for `a { x = ${a.x} ... }` chains
    for k, v in src.items():
        old = dst[k] if k in dst else _MISSING  # explicit null ≠ absent
        if prefix is not None:
            v = _snapshot_self(v, prefix + [k], old)
        if isinstance(v, _Append):
            dst[k] = _combine_append(old, v)
        elif isinstance(old, dict) and isinstance(v, dict):
            _merge(old, v, prefix=prefix + [k] if prefix is not None else None)
        elif isinstance(v, _Subst) and v.optional and old is not _MISSING:
            dst[k] = _Fallback(old, v)
        else:
            dst[k] = v


def _concat_str(v: Any) -> str:
    if v is None:
        return "null"  # explicit null renders per HOCON value concat
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        return v
    if isinstance(v, (dict, list)):
        raise HoconError("cannot string-concatenate an object/list with scalars")
    return str(v)


def _resolve(node: Any, root: dict[str, Any], seen: frozenset = frozenset()) -> Any:
    if isinstance(node, _Subst):
        key = tuple(node.path)
        if key in seen:
            raise HoconError(f"substitution cycle through ${{{'.'.join(node.path)}}}")
        cur: Any = root
        for part in node.path:
            if not isinstance(cur, dict) or part not in cur:
                # HOCON fallback: a substitution unresolved in the file
                # looks up the dotted path verbatim in the environment
                env = os.environ.get(".".join(node.path))
                if env is not None:
                    return env
                if node.optional:
                    return _MISSING  # field/element omitted, not null
                raise HoconError(f"unresolved substitution ${{{'.'.join(node.path)}}}")
            cur = cur[part]
        # recursively resolve WHATEVER the lookup returned — a chained
        # substitution, or an object/list whose members contain
        # substitutions (otherwise raw _Subst nodes leak into output)
        return _resolve(cur, root, seen | {key})
    if isinstance(node, _Fallback):
        v = _resolve(node.sub, root, seen)
        return _resolve(node.prev, root, seen) if v is _MISSING else v
    if isinstance(node, _Append):
        return [
            v for v in (_resolve(x, root, seen) for x in node.items) if v is not _MISSING
        ]
    if isinstance(node, _Concat):
        vals = [_resolve(p, root, seen) for p in node.parts]
        if node.is_append:
            base, items = vals
            if base is _MISSING:
                return items  # `a = ${?missing}` then `a += x`
            if not isinstance(base, list):
                raise HoconError(
                    f"'+=' requires a list target, found {_type_name(base)}"
                )
            return base + items
        present = [v for v in vals if v is not _MISSING]
        if not present:
            return _MISSING  # every part was a missing optional
        if all(isinstance(v, list) for v in present):
            return [x for v in present for x in v]
        if all(isinstance(v, dict) for v in present):
            merged: dict[str, Any] = {}
            for v in present:
                _merge(merged, v)
            return merged
        out: list[str] = []
        for idx, v in enumerate(vals):
            if idx:
                out.append(node.seps[idx - 1])
            if v is not _MISSING:
                out.append(_concat_str(v))
        return "".join(out)
    if isinstance(node, dict):
        resolved = {k: _resolve(v, root, seen) for k, v in node.items()}
        return {k: v for k, v in resolved.items() if v is not _MISSING}
    if isinstance(node, list):
        return [
            v for v in (_resolve(x, root, seen) for x in node) if v is not _MISSING
        ]
    return node


def loads(text: str, base_dir: str | None = None) -> dict[str, Any]:
    """Parse a HOCON-subset document into plain dicts/lists/scalars.
    ``base_dir`` anchors relative ``include`` paths (defaults to cwd)."""
    tree = _Parser(text.lstrip("﻿"), base_dir=base_dir).parse_root()
    return _resolve(tree, tree)


def load(path: str) -> dict[str, Any]:
    real = os.path.realpath(path)
    with open(real, encoding="utf-8") as f:
        text = f.read()
    tree = _Parser(
        text.lstrip("﻿"),
        base_dir=os.path.dirname(real),
        seen_files=frozenset({real}),
    ).parse_root()
    return _resolve(tree, tree)
