"""Command-line tools mirroring the reference's seven executables
(reference Sources/{PIRGenerateDatabase,PIRProcessDatabase,PIRShardDatabase,
PNNSGenerateDatabase,PNNSProcessDatabase,SimplePIRProcessDatabase,MMapTool}).

Run as: python -m she_tpu.cli.<tool> [args]
"""
