"""Multi-corpus registry (S2): many named index stores under one root,
with auto-assigned ids and cascading delete.

The reference namespaces many graphs/queries inside one database with
auto-increment ids (/root/reference/fornax/api.py:289-310) and deletes
them with cascading statements (api.py:327-345,637-647). The Spark
analogue: a catalog file mapping id/name -> store directory; delete
removes the catalog row AND the store's segments/ledger/tombstones
(everything under its directory) in one call.

Catalog writes are atomic (tmp + rename), same discipline as the
segment ledger.
"""

from __future__ import annotations

import json
import os
import shutil

from .segments import SegmentStore, open_segments

CATALOG_FILE = "catalog.json"


class Registry:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- catalog io ---------------------------------------------------
    def _catalog_path(self) -> str:
        return os.path.join(self.root, CATALOG_FILE)

    def _load(self) -> dict:
        p = self._catalog_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"next_id": 1, "corpora": {}}

    def _save(self, cat: dict) -> None:
        tmp = self._catalog_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cat, f, indent=1, sort_keys=True)
        os.replace(tmp, self._catalog_path())

    # -- api ----------------------------------------------------------
    KINDS = ("segments", "ann_lsh", "ann_ivf", "positional")

    def create(
        self, name: str | None = None, kind: str = "segments"
    ) -> tuple[int, str]:
        """Reserve a store slot: returns (auto id, store path to build
        into). Name defaults to corpus<id>; duplicate names are
        rejected (the reference's unique graph ids). `kind` types the
        row — segment stores and ANN (LSH / IVF) indexes live in ONE
        namespace, the way the reference keeps all corpora under one
        database (model.py:10-31)."""
        if kind not in self.KINDS:
            raise ValueError(f"unknown store kind {kind!r}; one of {self.KINDS}")
        cat = self._load()
        cid = cat["next_id"]
        name = name or f"corpus{cid}"
        if any(c["name"] == name for c in cat["corpora"].values()):
            raise ValueError(f"corpus name already registered: {name!r}")
        path = os.path.join(self.root, f"store_{cid:06d}")
        cat["corpora"][str(cid)] = {"name": name, "path": path, "kind": kind}
        cat["next_id"] = cid + 1
        self._save(cat)
        return cid, path

    def _resolve(self, key: int | str) -> tuple[str, dict]:
        cat = self._load()
        if isinstance(key, int) or str(key).isdigit():
            k = str(int(key))
            if k in cat["corpora"]:
                return k, cat
        for k, c in cat["corpora"].items():
            if c["name"] == key:
                return k, cat
        raise KeyError(f"no corpus {key!r} in registry {self.root}")

    def kind(self, key: int | str) -> str:
        """The registered store kind of a row (KeyError when absent) —
        lets callers type-check a name before opening or cascading a
        delete onto it."""
        k, cat = self._resolve(key)
        return cat["corpora"][k].get("kind", "segments")

    def open(self, key: int | str, spark=None):
        """Open by id or name, dispatching on the row's kind:
        segments -> SegmentStore, ann_lsh -> AnnIndex,
        ann_ivf -> IvfIndex (the ANN kinds need `spark` to re-read
        their parquet form), positional -> PositionalStore."""
        k, cat = self._resolve(key)
        c = cat["corpora"][k]
        kind = c.get("kind", "segments")
        if kind == "segments":
            return open_segments(c["path"])
        if kind == "positional":
            from .positional import open_positional_store

            return open_positional_store(c["path"])
        if spark is None:
            raise ValueError(f"opening a {kind!r} store requires spark=")
        from ..operators.similarity import open_ann_index, open_ivf_index

        opener = open_ann_index if kind == "ann_lsh" else open_ivf_index
        return opener(spark, c["path"])

    def list(self) -> list[dict]:
        cat = self._load()
        out = []
        for k in sorted(cat["corpora"], key=int):
            c = cat["corpora"][k]
            row = {
                "corpus_id": int(k),
                "name": c["name"],
                "path": c["path"],
                "kind": c.get("kind", "segments"),
            }
            ledger_p = os.path.join(c["path"], "ledger.json")
            if os.path.exists(ledger_p):
                with open(ledger_p) as f:
                    stats = json.load(f).get("stats") or {}
                row["n_docs"] = stats.get("n_docs")
            out.append(row)
        return out

    def set_path(self, key: int | str, new_path: str) -> None:
        """Repoint a corpus row at a new store directory (atomic catalog
        write) — the compaction step that swaps in a freshly merged
        store without ever mutating the old one in place."""
        k, cat = self._resolve(key)
        cat["corpora"][k]["path"] = new_path
        self._save(cat)

    def delete(self, key: int | str) -> None:
        """Cascading delete: catalog row + the whole store directory
        (segments, ledger, tombstones)."""
        k, cat = self._resolve(key)
        path = cat["corpora"][k]["path"]
        del cat["corpora"][k]
        self._save(cat)
        shutil.rmtree(path, ignore_errors=True)
