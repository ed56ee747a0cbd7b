"""WebIDL parser tests mirroring the reference's
test/webidl-parser/{global,includes,exported-names,well-known}.js."""

from reffy_ray.functions.webidl import normalize_webidl_1to2, parse_webidl


# -- exported-names.js -------------------------------------------------------


def test_exports_named_definitions():
    data = parse_webidl(
        """
      interface testInterface {};
      dictionary testDict {};
      enum testEnum { "one" };
      callback testCallback = void ();
      typedef string testTypedef;
      callback interface testCallbackInterface {};
    """
    )
    for n in ("testInterface", "testDict", "testEnum", "testCallback",
              "testCallbackInterface"):
        assert n in data["idlNames"], n


def test_does_not_export_partials():
    data = parse_webidl(
        """
      partial interface testInterface {};
      partial dictionary testDict {};
    """
    )
    assert "testInterface" not in data["idlNames"]
    assert "testDict" not in data["idlNames"]
    assert "testInterface" in data["idlExtendedNames"]


# -- includes.js -------------------------------------------------------------


def test_includes_statements():
    data = parse_webidl(
        """
interface Base {};
interface Extended {};
Extended includes Base;
    """
    )
    assert "Extended" in data["idlNames"]
    assert any(
        e.get("includes") == "Base" for e in data["idlExtendedNames"]["Extended"]
    )
    assert "Base" in data["dependencies"]["Extended"]
    assert "Base" not in data["externalDependencies"]  # defined here


# -- global.js ---------------------------------------------------------------


def test_not_exposed_on_window_by_default():
    data = parse_webidl("interface notExposedOnWindow {};")
    assert "Window" not in data["jsNames"]["functions"]
    assert data["globals"] == {}
    assert data["exposed"] == {}


def test_simple_global_definition_and_reference():
    data = parse_webidl(
        """
      [Global=primaryInterface]
      interface primaryInterface {};

      [Exposed=primaryInterface]
      interface exposedOnPrimaryInterface {};
    """
    )
    assert "primaryInterface" in data["globals"]["primaryInterface"]
    assert "exposedOnPrimaryInterface" in data["exposed"]["primaryInterface"]
    assert "exposedOnPrimaryInterface" in data["jsNames"]["functions"]["primaryInterface"]


def test_global_uses_global_name_not_interface_name():
    data = parse_webidl(
        """
      [Global=theInterface, Exposed=theInterface]
      interface anInterface {};
    """
    )
    assert "anInterface" in data["globals"]["theInterface"]
    assert "anInterface" not in data["globals"].get("anInterface", [])
    assert "anInterface" in data["exposed"]["theInterface"]
    assert "anInterface" in data["jsNames"]["functions"]["theInterface"]


def test_multiple_global_names():
    data = parse_webidl(
        """
      [Global=(theInterface,sameInterface), Exposed=theInterface]
      interface anInterface {};
    """
    )
    assert "anInterface" in data["globals"]["theInterface"]
    assert "anInterface" in data["globals"]["sameInterface"]
    assert "anInterface" in data["exposed"]["theInterface"]
    assert "sameInterface" not in data["exposed"]
    assert "sameInterface" not in data["jsNames"]["functions"]


def test_exposed_star():
    data = parse_webidl("[Exposed=*]\ninterface anInterface {};")
    assert "*" in data["exposed"]


# -- well-known.js -----------------------------------------------------------


def test_well_known_types_not_dependencies():
    for typ in ("undefined", "boolean", "DOMString", "long long"):
        data = parse_webidl(f"interface test {{ {typ} doNothing(); }};")
        assert data["dependencies"]["test"] == [], typ
        assert data["externalDependencies"] == [], typ


# -- normalization (parse-webidl.js:30-37) -----------------------------------


def test_webidl1_array_normalization():
    assert (
        normalize_webidl_1to2("attribute DOMString[] foo;")
        == "attribute FrozenArray<DOMString> foo;"
    )


def test_serializer_normalization():
    out = normalize_webidl_1to2("serializer = { attribute };")
    assert "toJSON()" in out


# -- dependency extraction ---------------------------------------------------


def test_external_dependency_listed():
    data = parse_webidl(
        "interface Foo : Bar { attribute Baz qux; };"
    )
    assert data["dependencies"]["Foo"] == ["Bar", "Baz"]
    assert set(data["externalDependencies"]) == {"Bar", "Baz"}


def test_fixture_idl_roundtrip():
    # the mock respec spec's IDL (mock-server.js:45-49)
    data = parse_webidl(
        "[Exposed=Window] interface Foo { attribute DOMString bar; };"
    )
    assert "Foo" in data["idlNames"]
    assert data["exposed"]["Window"] == ["Foo"]
    assert data["dependencies"]["Foo"] == []
