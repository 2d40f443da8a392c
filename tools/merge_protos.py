"""Merge per-file proto drafts into per-package .proto files with imports."""
import os
import re
import sys

SRC = "/tmp/protos5"
OUT = sys.argv[1]

PKG_FILES = {
    "apple.swift_homomorphic_encryption.v1": "apple/swift_homomorphic_encryption/v1/he.proto",
    "apple.swift_homomorphic_encryption.pir.v1": "apple/swift_homomorphic_encryption/pir/v1/pir.proto",
    "apple.swift_homomorphic_encryption.pnns.v1": "apple/swift_homomorphic_encryption/pnns/v1/pnns.proto",
    "apple.swift_homomorphic_encryption.api.shared.v1": "apple/swift_homomorphic_encryption/api/shared/v1/api_shared.proto",
    "apple.swift_homomorphic_encryption.api.pir.v1": "apple/swift_homomorphic_encryption/api/pir/v1/api_pir.proto",
    "apple.swift_homomorphic_encryption.api.pnns.v1": "apple/swift_homomorphic_encryption/api/pnns/v1/api_pnns.proto",
    "apple.swift_homomorphic_encryption.api.v1": "apple/swift_homomorphic_encryption/api/v1/api.proto",
}

SWIFT_PKGS = {
    "Apple_SwiftHomomorphicEncryption_V1_": "apple.swift_homomorphic_encryption.v1.",
    "Apple_SwiftHomomorphicEncryption_Pir_V1_": "apple.swift_homomorphic_encryption.pir.v1.",
    "Apple_SwiftHomomorphicEncryption_Pnns_V1_": "apple.swift_homomorphic_encryption.pnns.v1.",
    "Apple_SwiftHomomorphicEncryption_Api_Shared_V1_": "apple.swift_homomorphic_encryption.api.shared.v1.",
    "Apple_SwiftHomomorphicEncryption_Api_Pir_V1_": "apple.swift_homomorphic_encryption.api.pir.v1.",
    "Apple_SwiftHomomorphicEncryption_Api_Pnns_V1_": "apple.swift_homomorphic_encryption.api.pnns.v1.",
    "Apple_SwiftHomomorphicEncryption_Api_V1_": "apple.swift_homomorphic_encryption.api.v1.",
}

NESTED_INJECT = {
    # message name -> nested block appended before closing brace
    "Error": """  message ConfigVersionNotFound {
    ConfigResponse config_response = 1;
  }
  message EvaluationKeyNotFound {
  }
  message InvalidRequest {
  }
  message InternalError {
  }
""",
    "DatabaseMapping": """  message ChunkLocation {
    uint32 shard_index = 1;
    uint32 index = 2;
  }
  message Entry {
    uint64 original_index = 1;
    uint32 size = 2;
    repeated ChunkLocation chunks = 3;
  }
""",
}


def resolve(text, own_pkg):
    text = re.sub(r"\b(?:HomomorphicEncryptionProtobuf|ApplicationProtobuf)\.", "", text)
    text = text.replace("SwiftProtobuf.Google_Protobuf_Any", "google.protobuf.Any")
    # longest prefixes first
    for swift, pkg in sorted(SWIFT_PKGS.items(), key=lambda kv: -len(kv[0])):
        def repl(m):
            rest = m.group(1)
            full = pkg + rest
            if full.startswith(own_pkg + "."):
                short = full[len(own_pkg) + 1 :]
                return short
            return "." + full
        text = re.sub(r"\.?" + re.escape(swift) + r"([A-Za-z0-9_.]+)", repl, text)
    return text


def main():
    merged = {}
    for f in sorted(os.listdir(SRC)):
        text = open(os.path.join(SRC, f)).read()
        pkg = re.search(r"package ([\w.]+);", text).group(1)
        body = text.split(";", 2)[2] if False else "\n".join(text.splitlines()[3:])
        merged.setdefault(pkg, []).append(body)

    for pkg, bodies in merged.items():
        body = "\n".join(bodies)
        body = resolve(body, pkg)
        # inject nested messages
        for msg, block in NESTED_INJECT.items():
            pattern = r"(message %s \{\n)" % msg
            if re.search(pattern, body):
                body = re.sub(pattern, r"\1" + block.replace("\\", "\\\\"), body, count=1)
        # rewrite references Error.ConfigVersionNotFound etc remain valid as nested
        # determine imports
        imports = set()
        for other_pkg, path in PKG_FILES.items():
            if other_pkg == pkg:
                continue
            if other_pkg + "." in body:
                imports.add(path)
        header = ['syntax = "proto3";', f"package {pkg};", ""]
        if "google.protobuf.Any" in body:
            imports.add("google/protobuf/any.proto")
        header += [f'import "{p}";' for p in sorted(imports)]
        header.append("")
        out_path = os.path.join(OUT, PKG_FILES[pkg])
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        open(out_path, "w").write("\n".join(header) + body)
        print("wrote", out_path)


main()
