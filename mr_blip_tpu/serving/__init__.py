from mr_blip_tpu.serving.server import (  # noqa: F401
    MomentRetrievalServer, MRRequest, ServerStats,
)
