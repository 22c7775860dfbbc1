from shmgan_tpu.models.specseg import SpecSeg  # noqa: F401
from shmgan_tpu.models.generator import SHMGenerator  # noqa: F401
from shmgan_tpu.models.discriminator import SHMDiscriminator  # noqa: F401
