#!/usr/bin/env python3
"""Drop every file-op touching the given paths from a `git fast-export`
stream (stdin -> stdout, binary). The poor man's `git filter-repo
--invert-paths` for a sandbox where filter-repo cannot be installed
(zero egress); used by tools/package_release.sh.

The stream grammar (git's Documentation/git-fast-import.adoc) is line
oriented EXCEPT `data <N>` payloads (blob bodies, commit messages),
which are length-prefixed raw bytes and MUST be passed through
untouched — a naive line filter would mangle any committed file whose
content happens to look like an `M 100644 ...` op. So: copy lines,
switch to exact-N-bytes copy mode after each `data <N>` header, and in
commit blocks drop `M`/`D`/`R`/`C` ops whose path is banned.

Blobs for dropped paths still enter the stream (fast-export emits them
before knowing we drop their ops) — they import as unreachable objects
and the caller's `git gc --prune=now` removes them from the package.
"""
import sys

BANNED = set(sys.argv[1:])


def unquote(p: bytes) -> bytes:
    """Decode one git C-quoted path: a single left-to-right scan
    handling the backslash escapes git emits (\\a \\b \\f \\n \\r \\t \\v
    \\" \\\\ and 1-3 digit octal for non-ASCII bytes). Sequential
    .replace() calls would mis-decode paths whose DATA contains a
    backslash (the \\\\ must be resolved in stream order, not last)."""
    if not (p.startswith(b'"') and p.endswith(b'"') and len(p) >= 2):
        return p
    body = p[1:-1]
    out = bytearray()
    i = 0
    esc = {b"a"[0]: 7, b"b"[0]: 8, b"f"[0]: 12, b"n"[0]: 10,
           b"r"[0]: 13, b"t"[0]: 9, b"v"[0]: 11,
           b'"'[0]: 34, b"\\"[0]: 92}
    while i < len(body):
        c = body[i]
        if c != 92:  # not a backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= len(body):
            raise ValueError(f"dangling backslash in quoted path {p!r}")
        c = body[i]
        if c in esc:
            out.append(esc[c])
            i += 1
        elif 48 <= c <= 55:  # 1-3 octal digits
            j = i
            while j < len(body) and j < i + 3 and 48 <= body[j] <= 55:
                j += 1
            out.append(int(body[i:j], 8))
            i = j
        else:
            raise ValueError(f"unknown escape \\{chr(c)} in quoted path {p!r}")
    return bytes(out)


def take_path(s: bytes):
    """Split one path token off the front of `s`: a quoted path ends at
    its closing unescaped quote, an unquoted one at the next space (or
    end). Returns (decoded_path, rest_after_separator)."""
    if s.startswith(b'"'):
        i = 1
        while i < len(s):
            if s[i] == 92:  # backslash: skip the escaped byte
                i += 2
                continue
            if s[i] == 34:  # closing quote
                return unquote(s[: i + 1]), s[i + 2:]
            i += 1
        raise ValueError(f"unterminated quoted path in {s!r}")
    sp = s.find(b" ")
    if sp < 0:
        return s, b""
    return s[:sp], s[sp + 1:]


def banned(path: bytes) -> bool:
    return path.decode("utf-8", "replace") in BANNED


def main() -> None:
    inp = sys.stdin.buffer
    out = sys.stdout.buffer
    while True:
        line = inp.readline()
        if not line:
            break
        if line.startswith(b"data "):
            # length-prefixed payload: pass the header and exactly N raw
            # bytes through, no inspection. (The `data <<EOF` delimited
            # form is only accepted by fast-import, never produced by
            # fast-export, so N is always numeric here.)
            out.write(line)
            n = int(line[5:].strip())
            remaining = n
            while remaining > 0:
                chunk = inp.read(min(remaining, 1 << 20))
                if not chunk:
                    raise EOFError("truncated data block")
                out.write(chunk)
                remaining -= len(chunk)
            continue
        tag = line[:2]
        if tag == b"M ":
            # filemodify: M <mode> <dataref> <path-to-eol>
            parts = line.rstrip(b"\n").split(b" ", 3)
            path = unquote(parts[3])
            if banned(path):
                # an `inline` dataref carries its blob in the NEXT data
                # block; dropping the M line alone would leave that
                # block dangling and corrupt the stream. fast-export
                # never emits inline, so refuse rather than mis-filter.
                if parts[2] == b"inline":
                    raise ValueError(
                        f"cannot drop inline filemodify for {path!r}")
                continue
        elif tag == b"D ":
            if banned(unquote(line.rstrip(b"\n")[2:])):
                continue
        elif tag in (b"R ", b"C "):
            # rename/copy: <src> <dst>, either may be quoted — drop if
            # either side is banned (a rename FROM a banned path would
            # resurrect its content at the new name)
            src, rest = take_path(line.rstrip(b"\n")[2:])
            dst, _ = take_path(rest)
            if banned(src) or banned(dst):
                continue
        out.write(line)


if __name__ == "__main__":
    main()
