"""Converters & IO: mesh / pointcloud -> Gaussians, cuboid generator,
OFF/COFF/GOFF file formats (reference ``VoGE/Converter/``)."""

from voge_tpu.converter import converters as Converters
from voge_tpu.converter import cuboid as Cuboid
from voge_tpu.converter import io as IO
from voge_tpu.converter import shapes

from voge_tpu.converter.converters import (
    naive_vertices_converter,
    normal_mesh_converter,
    naive_point_cloud_converter,
    fixed_pointcloud_converter,
    convert_path,
    ComposedConverter,
)
from voge_tpu.converter.cuboid import cuboid_gauss, cuboid_mesh
from voge_tpu.converter.shapes import ico_sphere, load_obj, vertex_normals
from voge_tpu.converter.io import (
    load_off,
    save_off,
    load_goff,
    save_goff,
    to_jax,
    to_torch,
    pre_process_pascal,
)
