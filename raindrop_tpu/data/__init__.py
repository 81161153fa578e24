from raindrop_tpu.data.normalize import (  # noqa: F401
    get_stats,
    get_stats_static,
    mask_normalize,
    mask_normalize_static,
    tensorize_normalize,
    tensorize_normalize_no_static,
)
from raindrop_tpu.data.datasets import (  # noqa: F401
    Split,
    load_split,
    synthetic_split,
    prepare_split,
)
from raindrop_tpu.data.settings import (  # noqa: F401
    remove_sensors_fixed,
    remove_sensors_random,
    demographic_indices,
)
from raindrop_tpu.data.sampler import balanced_batches, n_batches_per_epoch  # noqa: F401
from raindrop_tpu.data.collate import (  # noqa: F401
    RaggedRecord,
    data_min_max,
    records_from_dense,
    variable_time_collate,
)
from raindrop_tpu.data.raw_irregular import (  # noqa: F401
    load_person_activity,
    load_physionet_dir,
    parse_person_activity,
    parse_physionet_outcomes,
    parse_physionet_record,
    union_time_collate,
)
