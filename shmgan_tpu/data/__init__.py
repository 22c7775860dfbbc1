from shmgan_tpu.data.loader import PolarimetricDataset  # noqa: F401
from shmgan_tpu.data.synthetic import (  # noqa: F401
    synth_polar_batch, write_fixture_tree,
)
