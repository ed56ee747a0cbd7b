"""Events extraction — faithful port of the reference contract
(reference: src/browserlib/extract-events.mjs, line refs below).

Whole-document pass over the in-memory DOM (summary tables, CSS def
tables, event-definition tables, "fire an event" phrasing ranges, IDL
on<event> handlers, event-typed dfns, isSameEvent folding), run at
parse time; the result lands in one ``events-data`` span that
``extract_events`` explodes into rows.
"""

from __future__ import annotations

import re

from .cssdfn import _in_informative, _is_aside, _text_excluding
from .htmldom import Node

_RE_IFACE = re.compile(r"^([A-Z]+[a-z0-9]*)+Event$")


def _href_of(el: Node | None, page_url: str) -> str | None:
    """href helper (extract-events.mjs:7): absolute URL when el has an
    id, else None."""
    from .cssdfn import _abs_url

    if el is None or not el.id:
        return None
    return _abs_url(el, page_url)


def _closest_id(el: Node | None) -> Node | None:
    if el is None:
        return None
    return el.closest(lambda a: bool(a.id))


def _clean(el: Node) -> str:
    return _text_excluding(el, _is_aside)


def _norm_text(el: Node) -> str:
    return el.text().strip()


def _next_element_siblings(node: Node):
    parent = node.parent
    if parent is None:
        return
    sibs = parent.element_children()
    try:
        i = sibs.index(node)
    except ValueError:
        return
    yield from sibs[i + 1:]


def _prev_element_siblings(node: Node):
    parent = node.parent
    if parent is None:
        return
    sibs = parent.element_children()
    try:
        i = sibs.index(node)
    except ValueError:
        return
    yield from reversed(sibs[:i])


def _handled_event_names(pages) -> dict[str, list[str]]:
    """on<event> EventHandler attributes per interface/mixin
    (extract-events.mjs:12-34); empty on invalid IDL."""
    from .parse import _Walker as W  # lazy: avoid import cycle
    from .parse import clean_text, dedent_code

    from ..functions.webidl import parse_webidl

    # assemble the document IDL the way extract-webidl does
    blocks: list[str] = []
    for _url, root in pages:
        for el in root.iter():
            if el.tag == "pre" and W._is_idl_pre(el, el.classes):
                if not _in_informative(el):
                    blocks.append(dedent_code(clean_text(el)))
    idl = "\n\n".join(blocks)
    if not idl.strip():
        return {}
    try:
        report = parse_webidl(idl)
    except Exception:
        return {}
    handled: dict[str, list[str]] = {}
    for name, desc in (report.get("idlNames") or {}).items():
        if desc.get("type") not in ("interface", "interface mixin"):
            continue
        for m in re.finditer(
            r"attribute\s+EventHandler\s+on(\w+)\s*;", desc.get("fragment", "")
        ):
            handled.setdefault(m.group(1), []).append(name)
    return handled


def _is_same_event(e1: dict, e2: dict) -> bool:
    """isSameEvent (extract-events.mjs:39-48)."""
    if e1.get("type") != e2.get("type"):
        return False
    if e1.get("href") and e1.get("href") == e2.get("href"):
        return True
    t1, t2 = e1.get("targets"), e2.get("targets")
    if t1 is not None and t2 is not None and sorted(t1) == sorted(t2):
        return True
    if t1 is None and t2 is None:
        return True
    return e2.get("src", {}).get("format") == "event table"


def _first_idl_pre_valid(pages) -> bool:
    return True


def extract_events_struct(pages, shortname: str | None = None) -> list[dict]:
    """extract-events.mjs:10-489 main flow."""
    handled = _handled_event_names(pages)

    def targets_from_el(event_el: Node | None, page_idx: int) -> list[str] | None:
        """fromEventElementToTargetInterfaces (extract-events.mjs:50-70)."""
        if event_el is None:
            return None
        dfn_for = event_el.get("data-dfn-for") or event_el.get("data-link-for")
        if dfn_for:
            return [t.strip() for t in dfn_for.split(",")]
        hhref = event_el.get("href") or ""
        if event_el.tag == "a" and hhref.startswith("#"):
            target_id = hhref[1:]
            dfn = _by_id(target_id)
            if dfn is not None and dfn.get("data-dfn-for"):
                return [t.strip() for t in dfn.get("data-dfn-for").split(",")]
            return None
        txt = _norm_text(event_el)
        ifaces = handled.get(txt)
        if ifaces and len(ifaces) == 1:
            return list(ifaces)
        return None

    def _by_id(node_id: str) -> Node | None:
        for _url, root in pages:
            for el in root.iter():
                if el.id == node_id:
                    return el
        return None

    events: list[dict] = []
    has_structured_data = False

    # --- summary tables + CSS def tables (extract-events.mjs:80-167) ------
    if shortname != "dom":
        for page_url, root in pages:
            for table in (el for el in root.iter() if el.tag == "table"):
                thead = table.first("thead")
                ths = list(thead.find_all("th")) if thead is not None else []
                first_heading = _norm_text(ths[0]) if ths else None
                if first_heading and re.match(r"^Event", first_heading) and \
                        first_heading != "Event handler":
                    has_structured_data = True
                    def col(rex):
                        for i, th in enumerate(ths):
                            if re.search(rex, _norm_text(th)):
                                return i
                        return -1

                    bubbling_col = col(r"(?i)^bubbl")
                    cancelable_col = col(r"(?i)^cancel")
                    interface_col = col(r"(?i)^(dom )?interface")
                    targets_col = col(r"(?i)target")

                    tbody = table.first("tbody") or table
                    for tr in tbody.find_all("tr"):
                        cells = tr.element_children()
                        if not cells:
                            continue
                        event: dict = {}
                        event_el = cells[0]
                        el = next(
                            (x for x in event_el.iter()
                             if x is not event_el and x.tag in ("dfn", "a")
                             and not _is_aside_within(x, event_el)),
                            None,
                        ) or next(
                            (x for x in event_el.iter()
                             if x is not event_el and x.tag == "code"
                             and not _is_aside_within(x, event_el)),
                            None,
                        )
                        if el is None:
                            continue
                        if el.tag == "dfn" and el.id:
                            event["href"] = _href_of(el, page_url)
                        elif el.tag == "a":
                            ahref = el.get("href") or ""
                            if not ahref.startswith("https://"):
                                frag = ahref.split("#")[-1] if "#" in ahref else ""
                                event["href"] = _href_of(_by_id(frag), page_url)
                            else:
                                event["href"] = ahref
                        event["src"] = {
                            "format": "summary table",
                            "href": _href_of(_closest_id(event_el), page_url),
                        }
                        event["type"] = _text_excluding(
                            event_el, _is_aside
                        ).strip()
                        tfrom = next(
                            (x for x in event_el.iter()
                             if x is not event_el
                             and (x.tag == "dfn"
                                  or (x.tag == "a"
                                      and (x.get("href") or "").startswith("#")))),
                            None,
                        )
                        event["targets"] = targets_from_el(tfrom, 0)
                        if bubbling_col >= 0 and bubbling_col < len(cells):
                            event["bubbles"] = (
                                _norm_text(cells[bubbling_col]) == "Yes"
                            )
                        if cancelable_col >= 0 and cancelable_col < len(cells):
                            event["cancelable"] = bool(
                                re.search(
                                    r"(?i)(yes)|✓|(varies)",
                                    _norm_text(cells[cancelable_col]),
                                )
                            )
                        if interface_col >= 0 and interface_col < len(cells):
                            icell = cells[interface_col]
                            ia = icell.first("a") or icell.first("code")
                            event["interface"] = (
                                _norm_text(ia) if ia is not None else None
                            )
                        if targets_col >= 0 and event.get("targets") is None \
                                and targets_col < len(cells):
                            event["targets"] = [
                                t.strip()
                                for t in _norm_text(cells[targets_col]).split(",")
                            ]
                        events.append(event)
                elif (table.get("class") or "") == "def":
                    # css def table (extract-events.mjs:144-166)
                    tbody = table.first("tbody") or table
                    row_ths = [
                        tr.first("th")
                        for tr in tbody.find_all("tr")
                        if tr.first("th") is not None
                    ]
                    if not any(_norm_text(th) == "Bubbles" for th in row_ths):
                        continue

                    def row_idx(rex):
                        for i, th in enumerate(row_ths):
                            if re.search(rex, _norm_text(th)):
                                return i
                        return -1

                    trs = [
                        c for c in (table.first("tbody") or table)
                        .element_children() if c.tag == "tr"
                    ] or list(tbody.find_all("tr"))

                    def cell2(i):
                        if i < 0 or i >= len(trs):
                            return None
                        tds = [
                            c for c in trs[i].element_children() if c.tag == "td"
                        ]
                        return tds[0] if tds else None

                    type_row = row_idx(r"(?i)^type")
                    bub_row = next(
                        (i for i, th in enumerate(row_ths)
                         if _norm_text(th) == "Bubbles"), -1)
                    can_row = next(
                        (i for i, th in enumerate(row_ths)
                         if _norm_text(th) == "Cancelable"), -1)
                    iface_row = row_idx(r"(?i)^interface")
                    name_cell = cell2(type_row)
                    event_name = _norm_text(name_cell) if name_cell is not None else None
                    bub_cell = cell2(bub_row)
                    can_cell = cell2(can_row)
                    iface_cell = cell2(iface_row)
                    if event_name:
                        h = _href_of(_closest_id(table), page_url)
                        events.append(
                            {
                                "type": event_name,
                                "interface": _norm_text(iface_cell)
                                if iface_cell is not None else None,
                                "bubbles": _norm_text(bub_cell) == "Yes"
                                if bub_cell is not None else None,
                                "cancelable": _norm_text(can_cell) == "Yes"
                                if can_cell is not None else None,
                                "src": {
                                    "format": "css definition table",
                                    "href": h,
                                },
                                "href": h,
                            }
                        )

    # --- event-definition tables (extract-events.mjs:170-212) -------------
    for page_url, root in pages:
        for table in (
            el for el in root.iter()
            if el.tag == "table" and "event-definition" in el.classes
        ):
            event = {}
            for tr in table.find_all("tr"):
                name_el = tr.first("th")
                value_el = tr.first("td")
                if name_el is None or value_el is None:
                    continue
                name = _norm_text(name_el).lower()
                value: object = _norm_text(value_el)
                if name == "trusted targets":
                    name = "targets"
                    value = [v.strip() for v in str(value).split(",")]
                if name in ("type", "interface", "targets"):
                    event[name] = value
                elif name in ("bubbles", "cancelable"):
                    event[name] = str(value).lower() == "yes"
            event["src"] = {
                "format": "event table",
                "href": _href_of(_closest_id(table), page_url),
            }
            if not any(_is_same_event(e, event) for e in events):
                events.append(event)

    # --- "fire an event" phrasing (extract-events.mjs:215-370) ------------
    firing_hrefs = {
        "https://dom.spec.whatwg.org/#concept-event-fire",
        "https://w3c.github.io/ServiceWorker/#fire-functional-event",
        "https://www.w3.org/TR/service-workers-1/#fire-functional-event-algorithm",
        "https://www.w3.org/TR/service-workers-1/#fire-functional-event",
        "https://www.w3.org/TR/service-workers/#fire-functional-event-algorithm",
        "https://www.w3.org/TR/service-workers/#fire-functional-event",
        "https://w3c.github.io/pointerevents/#dfn-fire-a-pointer-event",
    }

    def is_firing_link(el: Node) -> bool:
        return el.tag == "a" and (el.get("href") or "") in firing_hrefs

    for page_url, root in pages:
        for a in (el for el in root.iter() if is_firing_link(el)):
            if _in_informative(a):
                continue
            container = a.parent
            if container is None:
                continue
            # text from the firing link to the next firing link in the
            # container (or its end), asides removed
            next_firing = next(
                (el for el in _next_element_siblings(a) if is_firing_link(el)),
                None,
            )
            parsed_parts: list[str] = []
            started = False
            for c in container.children:
                if c is a:
                    started = True
                if not started:
                    continue
                if isinstance(c, str):
                    parsed_parts.append(c)
                    continue
                if next_firing is not None and c is next_firing:
                    break
                if not _is_aside(c):
                    parsed_parts.append(_text_excluding(c, _is_aside))
            parsed_text = "".join(parsed_parts)

            phrasing = None
            m = re.search(
                r"(?i)fir(e|ing)\s+a(n|\s+pointer)\s+event\s+named\s+\"?"
                r"(?P<eventName>[a-z]+)",
                parsed_text,
            )
            if m:
                phrasing = (
                    "fire an event" if m.group(2) == "n" else "fire a pointer event"
                )
            else:
                m = re.search(
                    r"(?i)fir(e|ing)\sa?\s*functional\s+event\s+"
                    r"((named|given)\s+)?\"?(?P<eventName>[a-z]+)",
                    parsed_text,
                )
                if m:
                    phrasing = "fire functional event"
            if not phrasing:
                continue
            name = m.group("eventName")
            if name in ("eventName", "type", "e", "event", "name"):
                continue
            new_event = True
            event = {
                "src": {
                    "format": "fire an event phrasing",
                    "href": _href_of(_closest_id(a), page_url),
                },
                "href": _href_of(_closest_id(a), page_url),
                "type": name,
            }
            sib = next(iter(_next_element_siblings(a)), None)
            event_el = None
            if sib is not None and _norm_text(sib) == event["type"]:
                event_el = next(
                    (x for x in sib.iter()
                     if x is not sib and x.tag in ("a", "dfn")),
                    None,
                ) or sib
            if event_el is not None:
                if event_el.tag == "a" and event_el.get("href"):
                    ah = event_el.get("href")
                    event["href"] = (
                        ah if "://" in ah else page_url.split("#")[0] + ah
                        if ah.startswith("#") else ah
                    )
                elif event_el.tag == "dfn" and event_el.id:
                    event["href"] = _href_of(event_el, page_url)
                event["targets"] = targets_from_el(event_el, 0)
            existing = next(
                (e for e in events if _is_same_event(event, e)), None
            )
            if existing is not None:
                new_event = False
                event = existing
            if not event.get("interface"):
                iface = None
                for cur in _next_element_siblings(a):
                    if next_firing is not None and cur is next_firing:
                        break
                    if _RE_IFACE.match(_norm_text(cur) or ""):
                        iface = _norm_text(cur)
                        break
                if iface:
                    event["interface"] = iface
                elif phrasing == "fire an event":
                    event["interface"] = "Event"
                elif phrasing == "fire a pointer event":
                    event["interface"] = "PointerEvent"
                else:
                    event["interface"] = "ExtendableEvent"
            if event.get("bubbles") is None and event.get("cancelable") is None:
                if re.search(r"bubbles and cancelable attributes", parsed_text):
                    if re.search(r"true", parsed_text):
                        event["bubbles"] = True
                        event["cancelable"] = True
                    elif re.search(r"false", parsed_text):
                        event["bubbles"] = False
                        event["cancelable"] = False
            if event.get("bubbles") is None:
                if re.search(r"bubbles attribute", parsed_text):
                    if re.search(r"true", parsed_text):
                        event["bubbles"] = True
                    elif re.search(r"false", parsed_text):
                        event["bubbles"] = False
                elif re.search(r"not bubble", parsed_text):
                    event["bubbles"] = False
                elif re.search(r"bubbles|bubbling", parsed_text):
                    event["bubbles"] = True
            if event.get("cancelable") is None:
                if re.search(r"cancelable attribute", parsed_text):
                    if re.search(r"true", parsed_text):
                        event["cancelable"] = True
                    elif re.search(r"false", parsed_text):
                        event["cancelable"] = False
                elif re.search(r"not cancelable|not be cancelable", parsed_text):
                    event["cancelable"] = False
                elif re.search(r"cancelable", parsed_text):
                    event["cancelable"] = True
            if new_event:
                events.append(event)

    # --- IDL on<event> handlers (extract-events.mjs:373-410) --------------
    body = next(
        (b for _u, r in pages for b in r.iter() if b.tag == "body"), None
    )
    body_href = _href_of(body, pages[0][0]) if body is not None else None
    for event_name, ifaces in handled.items():
        matching = [e for e in events if e.get("type") == event_name]
        if not matching and not has_structured_data:
            for iface in ifaces:
                events.append(
                    {
                        "type": event_name,
                        "targets": [iface],
                        "interface": None,
                        "src": {"format": "IDL eventHandler", "href": body_href},
                    }
                )
        elif len(matching) == 1:
            if not matching[0].get("targets"):
                matching[0]["targets"] = list(ifaces)

    # --- event-typed dfns (extract-events.mjs:412-469) ---------------------
    for page_url, root in pages:
        for dfn in (
            el for el in root.iter()
            if el.tag == "dfn" and el.get("data-dfn-type") == "event"
        ):
            ev_type = _norm_text(dfn)
            container = dfn.parent
            event = {
                "type": ev_type,
                "interface": None,
                "targets": targets_from_el(dfn, 0),
                "src": {
                    "format": "dfn",
                    "href": _href_of(_closest_id(dfn), page_url),
                },
                "href": _href_of(dfn, page_url),
            }
            bubbles = cancelable = iface = None
            if container is not None and container.tag == "dt":
                dd = next(
                    (s for s in _next_element_siblings(container)), None
                )
                if dd is not None:
                    for li in dd.find_all("li"):
                        t = _norm_text(li)
                        if t.startswith("Bubbles:"):
                            bubbles = bool(re.search(r"(?i)yes", t))
                        if t.startswith("Cancelable:"):
                            cancelable = bool(re.search(r"(?i)yes", t))
                cur = container.parent
                heading = None
                while cur is not None:
                    if re.match(r"^h[1-6]$", cur.tag):
                        heading = cur
                        break
                    prev = next(iter(_prev_element_siblings(cur)), None)
                    cur = prev if prev is not None else None
                if heading is not None:
                    code = heading.first("code")
                    if code is not None and re.match(
                        r"^[A-Z][a-z]+Event$", _norm_text(code)
                    ):
                        iface = _norm_text(code)
            existing = next(
                (e for e in events if _is_same_event(event, e)), None
            )
            if existing is None:
                if iface:
                    event["interface"] = iface
                event["bubbles"] = bubbles
                event["cancelable"] = cancelable
                events.append(event)
            else:
                if iface:
                    existing["interface"] = iface
                if not existing.get("href") and event.get("href"):
                    existing["href"] = event["href"]
                if bubbles is not None:
                    existing["bubbles"] = bubbles
                if cancelable is not None:
                    existing["cancelable"] = cancelable

    # --- final cleanup (extract-events.mjs:471-489) ------------------------
    base = pages[0][0]
    out = []
    for e in events:
        if "interface" in e and not e["interface"]:
            del e["interface"]
        if "href" in e and not e["href"]:
            del e["href"]
        if e.get("src") and "href" in e["src"] and not e["src"]["href"]:
            del e["src"]["href"]
        if e.get("href") and not e["href"].startswith(base):
            e["isExtension"] = True
        out.append(e)
    return out


def _is_aside_within(el: Node, top: Node) -> bool:
    n = el
    while n is not None and n is not top:
        if _is_aside(n):
            return True
        n = n.parent
    return False
