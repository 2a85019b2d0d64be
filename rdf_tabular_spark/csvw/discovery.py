"""S9 metadata discovery for bare tabular inputs — the local-file analog of
the reference cascade (metadata.rb:176-245, tabular.rb:31-35).

Order, as in ``Metadata.for_input``:

1. user-supplied metadata — handled by the caller (reader._load_group);
2. ``Link rel=describedby`` header — HTTP-only; the sandbox never fetches,
   so this step has no local analog and is skipped;
3. site-wide configuration: a ``.well-known/csvm`` file found in the
   input's directory or any ancestor (the nearest one plays the site-root
   config, tabular.rb:31) supplies URI templates, one per line; when none
   exists the spec defaults apply::

       {+url}-metadata.json
       csv-metadata.json

   Each template expands with ``url`` = the tabular file; the first
   expansion that exists, parses, AND describes the input
   (``describes_file?``, metadata.rb:984-991) wins — a location that does
   not describe the file is ignored with a warning, exactly like the
   reference;
4. no metadata found: the caller falls back to an embedded-metadata-only
   default table group (metadata.rb:237-241).
"""

from __future__ import annotations

import logging
import os
import re
from urllib.parse import urljoin, urlparse

log = logging.getLogger(__name__)

#: tabular.rb:32 SITE_WIDE_DEFAULT
SITE_WIDE_DEFAULT = ["{+url}-metadata.json", "csv-metadata.json"]

#: extensions routed through discovery instead of being read as metadata
TABULAR_EXTS = (".csv", ".tsv", ".tab", ".txt")

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")


def site_wide_templates(start_dir: str) -> tuple[list[str], str]:
    """Find the nearest ``.well-known/csvm`` at or above *start_dir* (the
    local analog of resolving ``/.well-known/csvm`` at the site root).
    Returns (templates, site_root_dir); the spec defaults when absent."""
    d = os.path.abspath(start_dir)
    while True:
        probe = os.path.join(d, ".well-known", "csvm")
        if os.path.isfile(probe):
            with open(probe, encoding="utf-8") as f:
                templates = [ln.strip() for ln in f if ln.strip()]
            return (templates or SITE_WIDE_DEFAULT), d
        parent = os.path.dirname(d)
        if parent == d:
            return SITE_WIDE_DEFAULT, os.path.abspath(start_dir)
        d = parent


def _expand(template: str, value: str) -> str:
    """Expand the ``{+url}`` / ``{url}`` forms the csvm config uses with a
    RAW value (paths must stay byte-identical for filesystem probing)."""
    return template.replace("{+url}", value).replace("{url}", value)


def describes_file(group, csv_path: str, base: str | None) -> bool:
    """metadata.rb:984-991 — the metadata is only useful when one of its
    tables describes the input (url match; basename match as the
    local-file fallback)."""
    name = os.path.basename(csv_path)
    for t in group.tables:
        if base and t.url == base:
            return True
        if os.path.basename(urlparse(t.url).path) == name:
            return True
    return False


def discover_metadata(
    csv_path: str, base: str | None = None
):
    """Run cascade step 3 for *csv_path*. Returns (metadata_path,
    metadata_base, compiled_group) for the winning location — the group is
    the one already loaded for the describes_file check, so the caller
    does not parse the document twice — or None (-> step 4).

    *base* is the tabular file's URL; the winning metadata document's base
    is the same template applied to that URL (so relative table urls inside
    it resolve back to the input, as when the reference joins the expanded
    template against the request URL)."""
    from .metadata import load_metadata

    csv_abs = os.path.abspath(csv_path)
    d = os.path.dirname(csv_abs)
    templates, site_root = site_wide_templates(d)
    name = os.path.basename(csv_abs)
    for tmpl in templates:
        loc = _expand(tmpl, name)
        if loc.startswith("/"):
            # absolute template path = relative to the site root analog
            # (the directory holding the .well-known config)
            loc_path = os.path.join(site_root, loc.lstrip("/"))
        else:
            loc_path = os.path.join(d, loc)
        if not os.path.isfile(loc_path):
            continue
        mbase: str | None = None
        if base:
            mbase = _expand(tmpl, base)
            if not _SCHEME_RE.match(mbase):
                mbase = urljoin(base, mbase)
        try:
            group = load_metadata(loc_path, base=mbase)
        except Exception as exc:  # malformed candidate: keep cascading
            log.warning("found metadata at %s, failed to parse (%s), "
                        "ignoring", loc_path, exc)
            continue
        if describes_file(group, csv_abs, base):
            return loc_path, mbase, group
        log.warning("found metadata at %s, which does not describe %s, "
                    "ignoring", loc_path, csv_path)
    return None
