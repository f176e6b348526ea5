"""Device mesh, sharding, and distributed-runtime utilities."""

from raytpu.parallel.mesh import (
    describe_devices,
    initialize_distributed,
    make_mesh,
    pixel_sharding,
)

__all__ = ["make_mesh", "pixel_sharding", "describe_devices",
           "initialize_distributed"]
