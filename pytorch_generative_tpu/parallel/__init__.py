from pytorch_generative_tpu.parallel.ep import (  # noqa: F401
    moe_forward_expert_parallel,
)
from pytorch_generative_tpu.parallel.fsdp import (  # noqa: F401
    fsdp_jit_train_step,
    fsdp_shardings,
    fsdp_spec,
    shard_tree_fsdp,
)
from pytorch_generative_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    make_mesh,
    pmean_tree,
    psum_tree,
    replicate,
    set_vq_axis_name,
    shard_batch,
)
from pytorch_generative_tpu.parallel.pp import (  # noqa: F401
    group_and_stack,
    image_gpt_pipeline_forward,
    pipeline_apply,
    pipeline_forward,
    pixel_snail_pipeline_forward,
    stack_blocks,
)
from pytorch_generative_tpu.parallel.ring_attention import (  # noqa: F401
    ring_attention_sharded,
    ring_causal_attention,
    ring_flash_attention_packed,
    ring_flash_attention_sharded,
)
from pytorch_generative_tpu.parallel.sp import (  # noqa: F401
    SequenceParallelImageGPT,
    image_gpt_sp_forward,
)
from pytorch_generative_tpu.parallel.tp import (  # noqa: F401
    IMAGE_GPT_TP_RULES,
    MODEL_AXIS,
    PIXEL_SNAIL_TP_RULES,
    TP_RULES_BY_MODEL,
    VD_VAE_TP_RULES,
    make_2d_mesh,
    shard_batch_2d,
    shard_tree,
    tree_shardings,
)
