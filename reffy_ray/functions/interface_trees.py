"""Interface tree hierarchies for event bubbling (J5).

Port of the reference's tree tables + getInterfaceTreeInfo
(src/lib/util.js:989-1046): maps an interface (walking its inheritance
chain) to the object tree it lives in, its depth, and the bubbling
path to the tree root.
"""

from __future__ import annotations

# spec shortname → root-to-leaf interface path (util.js:989-1013)
TREES: dict[str, list[str]] = {
    "dom": ["Window", "Document", "Node", "Node"],
    "IndexedDB": ["IDBDatabase", "IDBTransaction", "IDBRequest"],
    "web-bluetooth": [
        "Bluetooth", "BluetoothDevice", "BluetoothRemoteGATTService",
        "BluetoothRemoteGATTCharacteristic", "BluetoothRemoteGATTDescriptor",
    ],
    "serial": ["Serial", "SerialPort"],
}


def get_interface_tree_info(
    iface: str | None, inheritance: dict[str, str | None]
) -> dict | None:
    """util.js:1033-1046: walk the inheritance chain until an interface
    appears in a tree; returns {tree, interface, depth, bubblingPath}
    or None."""
    while iface:
        for tree, nodes in TREES.items():
            if iface in nodes:
                depth = len(nodes) - 1 - nodes[::-1].index(iface)  # lastIndexOf
                return {
                    "tree": tree,
                    "interface": iface,
                    "depth": depth,
                    "bubblingPath": list(reversed(nodes[:depth])),
                }
        iface = inheritance.get(iface)
    return None


def inherits_from(
    iface: str | None, base: str, inheritance: dict[str, str | None]
) -> bool:
    """events.js:165-173 helper."""
    seen = set()
    while iface and iface not in seen:
        if iface == base:
            return True
        seen.add(iface)
        iface = inheritance.get(iface)
    return False
