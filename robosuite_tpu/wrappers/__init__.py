from robosuite_tpu.wrappers.wrapper import Wrapper  # noqa: F401
from robosuite_tpu.wrappers.gym_wrapper import GymWrapper  # noqa: F401
from robosuite_tpu.wrappers.data_collection_wrapper import DataCollectionWrapper  # noqa: F401
from robosuite_tpu.wrappers.domain_randomization_wrapper import DomainRandomizationWrapper  # noqa: F401
from robosuite_tpu.wrappers.demo_sampler_wrapper import DemoSamplerWrapper  # noqa: F401
from robosuite_tpu.wrappers.visualization_wrapper import VisualizationWrapper  # noqa: F401
