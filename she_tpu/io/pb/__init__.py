"""Generated protobuf modules for the reference-compatible wire formats.

Schemas reconstructed from the reference's generated swift-protobuf code
(Sources/HomomorphicEncryptionProtobuf/generated, Sources/ApplicationProtobuf/
generated) via tools/extract_protos.py + tools/merge_protos.py; sources in
she_tpu/io/protos/. The generated *_pb2 modules import by absolute package
path, so this package root goes on sys.path.
"""

import os
import sys

_ROOT = os.path.dirname(os.path.abspath(__file__))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from apple.swift_homomorphic_encryption.v1 import he_pb2  # noqa: E402
from apple.swift_homomorphic_encryption.pir.v1 import pir_pb2  # noqa: E402
from apple.swift_homomorphic_encryption.pnns.v1 import pnns_pb2  # noqa: E402
from apple.swift_homomorphic_encryption.api.v1 import api_pb2  # noqa: E402
from apple.swift_homomorphic_encryption.api.shared.v1 import api_shared_pb2  # noqa: E402
from apple.swift_homomorphic_encryption.api.pir.v1 import api_pir_pb2  # noqa: E402
from apple.swift_homomorphic_encryption.api.pnns.v1 import api_pnns_pb2  # noqa: E402

__all__ = [
    "he_pb2",
    "pir_pb2",
    "pnns_pb2",
    "api_pb2",
    "api_shared_pb2",
    "api_pir_pb2",
    "api_pnns_pb2",
]
