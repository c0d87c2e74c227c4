"""File sink: templated JSON export with directory size cap + eviction.

Reference behavior (``ExportService.cs:157-197,333-362``): pretty-printed
JSON to a templated path, directories auto-created, export root capped
(oldest files evicted first; eviction skipped when the template has no
fixed directory prefix).
"""

from __future__ import annotations

import json
import os

from trignis_spark.sinks.base import ExportContext, Sink, render_template


def fixed_root(path_template: str) -> str | None:
    """The template's fixed directory prefix (the cleanup scope); None
    when the first path segment is already a placeholder
    (``ExportRootTests`` semantics)."""
    head, _, _ = path_template.partition("{")
    root = os.path.dirname(head)
    return root or None


def evict_oldest(root: str, size_limit_bytes: int) -> list[str]:
    """Delete oldest-first until the tree is under the cap (A8/W5);
    returns deleted paths."""
    entries = []
    total = 0
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            p = os.path.join(dirpath, fn)
            st = os.stat(p)
            entries.append((st.st_mtime, st.st_size, p))
            total += st.st_size
    deleted: list[str] = []
    for _mtime, size, p in sorted(entries):
        if total <= size_limit_bytes:
            break
        os.unlink(p)
        total -= size
        deleted.append(p)
    return deleted


class FileSink(Sink):
    def __init__(
        self,
        name: str,
        path_template: str,
        size_limit_bytes: int | None = 500 * 1024 * 1024,
        pretty: bool = True,
    ):
        self.name = name
        self.path_template = path_template
        self.size_limit_bytes = size_limit_bytes
        self.pretty = pretty

    def write(self, payload: str, ctx: ExportContext) -> None:
        path = render_template(self.path_template, ctx)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if self.pretty:
            payload = json.dumps(json.loads(payload), indent=2, sort_keys=False)
        with open(path, "w", encoding="utf-8") as f:
            f.write(payload)
        root = fixed_root(self.path_template)
        if root and self.size_limit_bytes is not None and os.path.isdir(root):
            evict_oldest(root, self.size_limit_bytes)
