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
    """fast-export C-quotes paths containing specials; ours are plain,
    but unquote defensively so a quoted banned path cannot slip by."""
    if p.startswith(b'"') and p.endswith(b'"'):
        return (
            p[1:-1]
            .replace(b"\\t", b"\t")
            .replace(b"\\n", b"\n")
            .replace(b'\\"', b'"')
            .replace(b"\\\\", b"\\")
        )
    return p


def banned(path: bytes) -> bool:
    return unquote(path).decode("utf-8", "replace") in BANNED


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
        if tag in (b"M ", b"D "):
            # filemodify: M <mode> <dataref> <path>; filedelete: D <path>
            path = line.rstrip(b"\n").split(b" ", 3 if tag == b"M " else 1)[-1]
            if banned(path):
                continue
        elif tag in (b"R ", b"C "):
            # rename/copy: <src> <dst> — drop if either side is banned
            # (a rename FROM a banned path would resurrect its content)
            parts = line.rstrip(b"\n").split(b" ", 2)
            if len(parts) == 3 and (banned(parts[1]) or banned(parts[2])):
                continue
        out.write(line)


if __name__ == "__main__":
    main()
