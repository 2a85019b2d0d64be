"""The CSVW JSON-LD initial context: prefix map + IRI expansion helpers.

The prefix table reproduces the term prefixes defined by the public W3C
CSVW ``@context`` (http://www.w3.org/ns/csvw) / RDFa initial context —
needed to expand compact IRIs like ``schema:url`` or ``dc:title`` that
appear in metadata documents (reference csvw.rb + JSON-LD context).
"""

from __future__ import annotations

import re
from urllib.parse import quote, urljoin

from .datatypes import CSVW_NS, RDF_NS, RDFS_NS, XSD

PREFIXES: dict[str, str] = {
    "as": "https://www.w3.org/ns/activitystreams#",
    "cc": "http://creativecommons.org/ns#",
    "csvw": CSVW_NS,
    "ctag": "http://commontag.org/ns#",
    "dc": "http://purl.org/dc/terms/",
    "dc11": "http://purl.org/dc/elements/1.1/",
    "dcat": "http://www.w3.org/ns/dcat#",
    "dcterms": "http://purl.org/dc/terms/",
    "dctypes": "http://purl.org/dc/dcmitype/",
    "dqv": "http://www.w3.org/ns/dqv#",
    "duv": "https://www.w3.org/ns/duv#",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "gr": "http://purl.org/goodrelations/v1#",
    "grddl": "http://www.w3.org/2003/g/data-view#",
    "ical": "http://www.w3.org/2002/12/cal/icaltzd#",
    "ldp": "http://www.w3.org/ns/ldp#",
    "ma": "http://www.w3.org/ns/ma-ont#",
    "oa": "http://www.w3.org/ns/oa#",
    "og": "http://ogp.me/ns#",
    "org": "http://www.w3.org/ns/org#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "prov": "http://www.w3.org/ns/prov#",
    "qb": "http://purl.org/linked-data/cube#",
    "rdf": RDF_NS,
    "rdfa": "http://www.w3.org/ns/rdfa#",
    "rdfs": RDFS_NS,
    "rev": "http://purl.org/stuff/rev#",
    "rif": "http://www.w3.org/2007/rif#",
    "rr": "http://www.w3.org/ns/r2rml#",
    "schema": "http://schema.org/",
    "sd": "http://www.w3.org/ns/sparql-service-description#",
    "sioc": "http://rdfs.org/sioc/ns#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "skosxl": "http://www.w3.org/2008/05/skos-xl#",
    "time": "http://www.w3.org/2006/time#",
    "v": "http://rdf.data-vocabulary.org/#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
    "void": "http://rdfs.org/ns/void#",
    "wdr": "http://www.w3.org/2007/05/powder#",
    "wdrs": "http://www.w3.org/2007/05/powder-s#",
    "xhv": "http://www.w3.org/1999/xhtml/vocab#",
    "xml": "http://www.w3.org/XML/1998/namespace",
    "xsd": XSD,
}

_PNAME_RE = re.compile(r"^([A-Za-z][\w.-]*):(?!//)(.*)$")
_ABSOLUTE_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def expand_iri(value: str, base: str | None = None, vocab: bool = False) -> str:
    """Expand a compact IRI / resolve a relative IRI the way the reference's
    JSON-LD context does for metadata values (documentRelative when *base*)."""
    if value is None:
        return None
    if value.startswith("_:"):
        # blank-node identifier: JSON-LD expand_iri returns it as-is
        # (never document-relative) — templated "_:{id}" urls yield bnodes
        return value
    m = _PNAME_RE.match(value)
    if m and m.group(1) in PREFIXES:
        return PREFIXES[m.group(1)] + m.group(2)
    if vocab and re.fullmatch(r"[A-Za-z_][\w.-]*", value):
        # bare term against the csvw vocabulary
        return CSVW_NS + value
    if _SCHEME_RE.match(value):
        return value
    if base:
        if value.startswith("#"):
            return base.split("#", 1)[0] + value
        return urljoin(base, value)
    return value


def encode_column_name(title: str) -> str:
    """Default a column name from its title: percent-encode with a stricter
    first character (reference metadata.rb:1621-1628)."""
    if not title:
        return title
    first = quote(title[0], safe="")
    if re.fullmatch(r"[A-Za-z0-9]", title[0]):
        first = title[0]
    rest = quote(title[1:], safe="_.")
    return first + rest
