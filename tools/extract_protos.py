"""One-off: reconstruct .proto schemas from swift-protobuf generated files."""
import re
import sys
import os
from collections import OrderedDict

SRC_DIRS = [
    "/root/reference/Sources/HomomorphicEncryptionProtobuf/generated",
    "/root/reference/Sources/ApplicationProtobuf/generated",
]
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/protos"

TYPE_MAP = {
    "UInt64": "uint64", "UInt32": "uint32", "Int64": "int64", "Int32": "int32",
    "SInt64": "sint64", "SInt32": "sint32", "Fixed64": "fixed64", "Fixed32": "fixed32",
    "SFixed64": "sfixed64", "SFixed32": "sfixed32", "Bool": "bool", "Bytes": "bytes",
    "String": "string", "Double": "double", "Float": "float",
}


def swift_to_proto_type(swift_type, type_registry):
    swift_type = swift_type.strip().rstrip("?").strip()
    if swift_type in type_registry:
        return type_registry[swift_type]
    return swift_type  # fallback


def camel_to_snake(name):
    s = re.sub(r"([A-Z]+)", r"_\1", name).lower().lstrip("_")
    return s


def parse_file(path, type_registry, files):
    text = open(path).read()
    pkg_m = re.search(r'_protobuf_package = "([^"]+)"', text)
    if pkg_m:
        package = pkg_m.group(1)
    else:
        base = os.path.basename(path)
        m2 = re.match(r"apple_swift_homomorphic_encryption_((?:api_)?(?:pir_|pnns_|shared_)?v1)_", base)
        sub = m2.group(1).replace("_", ".") if m2 else "v1"
        package = "apple.swift_homomorphic_encryption." + sub
    fname = os.path.basename(path).replace(".pb.swift", ".proto")

    # register swift type -> proto full name
    for m in re.finditer(r'extension (\w+): SwiftProtobuf\.(?:Message|Enum)?', text):
        pass
    # enums: public enum Apple_X_Y: SwiftProtobuf.Enum
    enums = OrderedDict()
    for m in re.finditer(
        r"public enum (\w+): SwiftProtobuf\.Enum, Swift\.CaseIterable \{(.*?)\n\}", text, re.S
    ):
        swift_name, body = m.group(1), m.group(2)
        cases = re.findall(r"case (\w+) // = (\d+)", body)
        enums[swift_name] = cases
        type_registry[swift_name] = swift_name.split("_")[-1]

    # enum proto value names from nameMap
    enum_value_names = {}
    for m in re.finditer(
        r"extension (\w+): SwiftProtobuf\._ProtoNameProviding \{\s*public static let _protobuf_nameMap"
        r".*?bytecode: \"(.*?)\"\)", text, re.S
    ):
        swift_name, bytecode = m.group(1), m.group(2)
        names = [t for t in re.split(r"\\0|\\u\{\d+\}", bytecode) if t]
        enum_value_names[swift_name] = names

    # messages
    messages = OrderedDict()
    for m in re.finditer(r"public struct (\w+): Sendable \{(.*?)\n\}\n", text, re.S):
        swift_name, body = m.group(1), m.group(2)
        type_registry[swift_name] = swift_name.split("_")[-1]

    # message extensions with decodeMessage: split on extension boundaries
    for chunk in text.split("\nextension ")[1:]:
        chunk = "extension " + chunk
        hm = re.match(r"extension ([\w.]+): SwiftProtobuf\.Message", chunk)
        if not hm:
            continue
        swift_name = hm.group(1)
        nm = re.search(r'protoMessageName: String = ([^\n]+)\n', chunk)
        name_expr = nm.group(1) if nm else swift_name
        bm = re.search(r'_NameMap\((?:bytecode: "(.*?)")?\)', chunk, re.S)
        bytecode = bm.group(1) if bm and bm.group(1) else ""
        dm = re.search(r"decodeMessage<D: SwiftProtobuf\.Decoder>\(decoder: inout D\) throws \{(.*?)\n  \}", chunk, re.S)
        if not dm:
            continue
        decode_body = dm.group(1)
        field_names = [t for t in re.split(r"\\0|\\u\{\d+\}", bytecode) if t]
        struct_body = text
        fields = []  # (number, label, type, name, oneof)
        for fm in re.finditer(
            r"case (\d+): try \{ try decoder\.decode(Singular|Repeated)(\w+)Field\(value: &(?:self|_storage)\.(_?\w+)\) \}\(\)",
            decode_body,
        ):
            num, label, ftype, prop = fm.groups()
            prop = prop.lstrip("_")
            if prop.endswith("_p"):
                prop = prop[:-2]
            if ftype in TYPE_MAP:
                ptype = TYPE_MAP[ftype]
            else:
                vm = re.search(r"var _?%s: (?:\[)?([\w.]+)" % re.escape(prop), text)
                ptype = ("." + vm.group(1)) if vm else "UNKNOWN"
            fields.append((int(num), "repeated " if label == "Repeated" else "", ptype, prop, None))
        for fm in re.finditer(
            r"case (\d+): try \{ try decoder\.decodeMapField\(fieldType: SwiftProtobuf\._Protobuf(?:Message)?Map<SwiftProtobuf\.Protobuf(\w+),\s*([\w.]+)>\.self, value: &(?:self|_storage)\.(\w+)\) \}\(\)",
            decode_body,
        ):
            num, ktype, vtype, prop = fm.groups()
            k = TYPE_MAP.get(ktype, ktype.lower())
            v = TYPE_MAP.get(vtype.split("Protobuf")[-1], "." + vtype)
            fields.append((int(num), "", f"map<{k}, {v}>", prop, None))
        for fm in re.finditer(
            r"case (\d+): try \{\n\s*var v: ([\w.]+)\?(?:.*?)(?:self|_storage)\.(_?\w+) = \.(\w+)\(v\)",
            decode_body,
            re.S,
        ):
            num, vtype, oneof_prop, case_name = fm.groups()
            ptype = TYPE_MAP.get(vtype, None)
            if ptype is None:
                ptype = "." + vtype
            fields.append((int(num), "", ptype, case_name, oneof_prop))
        fields.sort(key=lambda f: f[0])
        named = []
        plain_names = iter(field_names)
        for num, label, ptype, prop, oneof in fields:
            try:
                pname = next(plain_names)
            except StopIteration:
                pname = camel_to_snake(prop)
            named.append((num, label, ptype, pname, oneof))
        if "." not in swift_name:
            messages[swift_name] = (name_expr.strip(), named)

    files[fname] = (package, enums, enum_value_names, messages)


def main():
    os.makedirs(OUT, exist_ok=True)
    type_registry = {}
    files = {}
    for d in SRC_DIRS:
        for f in sorted(os.listdir(d)):
            if f.endswith(".pb.swift"):
                parse_file(os.path.join(d, f), type_registry, files)

    # second pass: resolve .SwiftType references to proto full names
    swift_to_full = {}
    for fname, (package, enums, _, messages) in files.items():
        for sn in enums:
            swift_to_full[sn] = package + "." + sn.split("_")[-1]
        for sn, (name_expr, _) in messages.items():
            # proto name from expression if simple
            mm = re.search(r'_protobuf_package \+ "\.(\w+)"', name_expr)
            if mm:
                swift_to_full[sn] = package + "." + mm.group(1)
            else:
                swift_to_full[sn] = package + "." + sn.split("_")[-1]

    for fname, (package, enums, enum_value_names, messages) in files.items():
        lines = ['syntax = "proto3";', f"package {package};", ""]
        for sn, cases in enums.items():
            pname = swift_to_full.get(sn, sn).split(".")[-1]
            lines.append(f"enum {pname} {{")
            vnames = enum_value_names.get(sn, [])
            for i, (case, num) in enumerate(cases):
                vn = vnames[i] if i < len(vnames) else camel_to_snake(case).upper()
                lines.append(f"  {vn} = {num};")
            lines.append("}")
            lines.append("")
        for sn, (name_expr, fields) in messages.items():
            pname = swift_to_full.get(sn, sn).split(".")[-1]
            lines.append(f"message {pname} {{")
            def fix_type(ptype):
                if ptype.startswith("."):
                    ref = ptype[1:]
                    full = swift_to_full.get(ref, ref)
                    return full if not full.startswith(package + ".") else full[len(package) + 1:]
                return ptype
            oneofs = OrderedDict()
            for num, label, ptype, fname2, oneof in fields:
                if oneof is not None:
                    oneofs.setdefault(oneof, []).append((num, label, fix_type(ptype), fname2))
                else:
                    lines.append(f"  {label}{fix_type(ptype)} {fname2} = {num};")
            for oneof, members in oneofs.items():
                lines.append(f"  oneof {camel_to_snake(oneof)} {{")
                for num, label, ptype, fname2 in members:
                    lines.append(f"    {ptype} {fname2} = {num};")
                lines.append("  }")
            lines.append("}")
            lines.append("")
        open(os.path.join(OUT, fname), "w").write("\n".join(lines))
        print(f"wrote {fname}: {len(enums)} enums, {len(messages)} messages")


main()
