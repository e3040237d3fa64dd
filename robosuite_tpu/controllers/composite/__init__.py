from robosuite_tpu.controllers.composite.composite_controller import (  # noqa: F401
    CompositeControllerSpec,
    make_composite,
)
