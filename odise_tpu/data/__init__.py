from .build import get_openseg_labels, prompt_labels
from .catalog import DatasetCatalog, Metadata, MetadataCatalog
from .dataset_mapper import COCOPanopticDatasetMapper, collate

# register builtin datasets at import time (reference register_pascal.py:603)
from .datasets import register_coco  # noqa: F401
from .datasets import register_ade20k  # noqa: F401
from .datasets import register_pascal  # noqa: F401
from .datasets import register_mapillary  # noqa: F401
from .datasets import register_coco_stuff  # noqa: F401
