"""T4: common (non-CSVW) metadata properties -> triples, and T5 provenance.

The reference expands common properties through JSON-LD normal form
(metadata.rb:915-973 ``common_properties``; normalization
metadata.rb:1155-1199) and emits them on the TableGroup/Table nodes only
(reader.rb:174-179, 338-343). Values are small driver-side metadata, so the
expansion is plain Python producing literal triple rows; blank nodes are
deterministic skolem ids (distributed dedup/resume safety, SURVEY.md §7.4).
"""

from __future__ import annotations

from ..csvw.context import PREFIXES, expand_iri
from ..csvw.datatypes import CSVW_NS, RDF_TYPE, XSD
from .emit import skolem_str

PROV = "http://www.w3.org/ns/prov#"

TripleRow = tuple  # (subj, pred, obj, obj_is_iri, obj_datatype, obj_lang)


def _expand_key(key: str, base: str) -> str | None:
    if key == "notes":
        return CSVW_NS + "note"
    if key.startswith("@"):
        return None
    if ":" in key:
        return expand_iri(key, base=base)
    # a bare term that is not a known CSVW/term key is invalid as a common
    # property (reference warns + drops, metadata.rb:931-936)
    return None


def _expand_type(value: str, base: str) -> str:
    return expand_iri(value, base=base)


def common_property_triples(
    node: str, props: dict, base: str, lang: str | None = None,
) -> list[TripleRow]:
    """Expand the common-property dict of a TableGroup/Table to triples
    hanging off *node*."""
    out: list[TripleRow] = []
    for key, value in sorted(props.items()):
        pred = _expand_key(key, base)
        if pred is None:
            continue
        _emit_value(out, node, pred, value, base, lang, path=(key,))
    return out


def _emit_value(out, subj, pred, value, base, lang, path) -> None:
    if isinstance(value, list):
        for i, item in enumerate(value):
            _emit_value(out, subj, pred, item, base, lang, path + (i,))
        return
    if isinstance(value, dict):
        if "@value" in value:
            v = value["@value"]
            dt = value.get("@type")
            vlang = value.get("@language")
            if dt is not None:
                out.append((subj, pred, _to_lex(v), False,
                            _expand_type(dt, base), None))
            elif vlang is not None:
                out.append((subj, pred, str(v), False, None, vlang))
            else:
                out.append(_native_literal(subj, pred, v))
            return
        if set(value.keys()) == {"@id"}:
            out.append((subj, pred, expand_iri(value["@id"], base=base),
                        True, None, None))
            return
        # node object -> deterministic bnode, recurse
        bnode = skolem_str("cp", base, *map(str, path), prefix="_:cp")
        if "@id" in value:
            bnode = expand_iri(value["@id"], base=base)
        out.append((subj, pred, bnode, True, None, None))
        types = value.get("@type", [])
        for t in types if isinstance(types, list) else [types]:
            out.append((bnode, RDF_TYPE, _expand_type(t, base), True, None, None))
        for k, v in sorted(value.items()):
            if k.startswith("@"):
                continue
            p2 = _expand_key(k, base)
            if p2 is None:
                continue
            _emit_value(out, bnode, p2, v, base, lang, path + (k,))
        return
    if isinstance(value, str):
        # natural-language value: default language applies (normalize_jsonld)
        out.append((subj, pred, value, False, None, lang))
        return
    out.append(_native_literal(subj, pred, value))


def _to_lex(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _native_literal(subj, pred, v) -> TripleRow:
    if isinstance(v, bool):
        return (subj, pred, "true" if v else "false", False, XSD + "boolean", None)
    if isinstance(v, int):
        return (subj, pred, str(v), False, XSD + "integer", None)
    if isinstance(v, float):
        return (subj, pred, repr(v), False, XSD + "double", None)
    return (subj, pred, str(v), False, None, None)


def provenance_triples(
    group_node: str, table_urls: list[str], metadata_urls: list[str],
    started_at: str, ended_at: str,
) -> list[TripleRow]:
    """T5 (reader.rb:221-248): prov activity describing the run. Timestamps
    are passed in (xsd:dateTime lexicals) so runs stay deterministic."""
    activity = skolem_str("prov", group_node, started_at, prefix="_:prov")
    out: list[TripleRow] = [
        (group_node, PROV + "wasGeneratedBy", activity, True, None, None),
        (activity, RDF_TYPE, PROV + "Activity", True, None, None),
        (activity, PROV + "startedAtTime", started_at, False,
         XSD + "dateTime", None),
        (activity, PROV + "endedAtTime", ended_at, False,
         XSD + "dateTime", None),
    ]
    for url, role in (
        [(u, CSVW_NS + "csvEncodedTabularData") for u in table_urls]
        + [(u, CSVW_NS + "tabularMetadata") for u in metadata_urls]
    ):
        usage = skolem_str("usage", activity, url, prefix="_:use")
        out += [
            (activity, PROV + "qualifiedUsage", usage, True, None, None),
            (usage, RDF_TYPE, PROV + "Usage", True, None, None),
            (usage, PROV + "entity", url, True, None, None),
            (usage, PROV + "hadRole", role, True, None, None),
        ]
    return out
