"""Task CLIs (the reference's ModelNet/, ShapeNet/, ScanNet/ script layer):
``python -m mccnn_tpu.tasks.{modelnet,shapenet,scannet,normals} --help``."""
