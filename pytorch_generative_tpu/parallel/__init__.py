from pytorch_generative_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    make_mesh,
    pmean_tree,
    psum_tree,
    replicate,
    set_vq_axis_name,
    shard_batch,
)
