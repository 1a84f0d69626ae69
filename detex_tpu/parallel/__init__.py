"""Multi-chip execution layer: device meshes and sharded detection scans."""
from detex_tpu.parallel import mesh, scan

__all__ = ["mesh", "scan"]
