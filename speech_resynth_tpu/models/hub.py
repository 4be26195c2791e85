"""Hub-id resolution for ``from_pretrained``-style loaders.

The reference loads its published composite checkpoint by hub id
(``ConditionalFlowMatchingWithHifiGan.from_pretrained(
"ryota-komatsu/flow_matching_with_hifigan")``, /root/reference/README.md:43)
— HF transformers resolves the id against the local HuggingFace cache and
downloads on miss.  Our loaders take local directories; this module adds the
id→directory step so hub ids work wherever a directory does:

1. an existing local directory is returned as-is;
2. an ``org/name`` id is resolved against the standard HF cache layout
   (``$HF_HUB_CACHE`` / ``$HF_HOME/hub`` / ``~/.cache/huggingface/hub``,
   ``models--org--name/snapshots/<sha>`` with ``refs/main`` preferred);
3. on cache miss, ``huggingface_hub.snapshot_download`` is attempted (works
   on hosts with egress); failure raises one clear FileNotFoundError naming
   every location tried instead of transformers' opaque stack.

No network access ever happens when the cache already holds the snapshot.
"""

from __future__ import annotations

import logging
import os
import re
from pathlib import Path
from typing import Optional

_HUB_ID = re.compile(r"^[\w.\-]+/[\w.\-]+$")


def _cache_roots(cache_dir: Optional[str]) -> list:
    roots = []
    if cache_dir:
        roots.append(Path(cache_dir))
    if os.environ.get("HF_HUB_CACHE"):
        roots.append(Path(os.environ["HF_HUB_CACHE"]))
    if os.environ.get("HF_HOME"):
        roots.append(Path(os.environ["HF_HOME"]) / "hub")
    roots.append(Path.home() / ".cache" / "huggingface" / "hub")
    return roots


def _cached_snapshot(repo_id: str, root: Path) -> Optional[Path]:
    repo_dir = root / ("models--" + repo_id.replace("/", "--"))
    snapshots = repo_dir / "snapshots"
    if not snapshots.is_dir():
        return None
    ref = repo_dir / "refs" / "main"
    if ref.is_file():
        sha = ref.read_text().strip()
        snap = snapshots / sha
        if snap.is_dir():
            return snap
    # No refs/main (partial cache): newest snapshot wins.
    candidates = sorted(
        (p for p in snapshots.iterdir() if p.is_dir()),
        key=lambda p: p.stat().st_mtime,
        reverse=True,
    )
    return candidates[0] if candidates else None


def resolve_pretrained_dir(name_or_path, cache_dir: Optional[str] = None) -> Path:
    """Resolve a local directory or ``org/name`` hub id to a checkpoint dir.

    Returns the directory unchanged when it exists locally; otherwise treats
    the string as a HuggingFace hub id, searching the HF cache and falling
    back to ``snapshot_download`` when the host has egress.
    """
    path = Path(name_or_path)
    if path.is_dir():
        return path

    name = str(name_or_path)
    if not _HUB_ID.match(name) or path.is_absolute():
        raise FileNotFoundError(
            f"pretrained checkpoint directory not found: {name!r} "
            "(not an existing directory, and not an 'org/name' hub id)"
        )

    tried = []
    for root in _cache_roots(cache_dir):
        snap = _cached_snapshot(name, root)
        if snap is not None:
            return snap
        tried.append(str(root))

    try:
        from huggingface_hub import snapshot_download

        # Loud on purpose: a mistyped relative local path ('checkpoints/x')
        # is indistinguishable from a hub id — make the network fallback
        # visible so third-party weights are never fetched silently.
        logging.getLogger(__name__).warning(
            "%r is not a local directory and is not in any HF cache; "
            "treating it as a HuggingFace hub id and attempting download",
            name,
        )
        return Path(snapshot_download(name, cache_dir=cache_dir))
    except Exception as exc:  # offline host, missing dependency, bad id, ...
        raise FileNotFoundError(
            f"hub id {name!r} is not in any local HF cache "
            f"(searched: {', '.join(tried)}) and downloading failed "
            f"({type(exc).__name__}: {exc}). On an egress-less host, copy the "
            "checkpoint into one of the cache roots or pass a local directory."
        ) from None
