from tpu_unet.data.loader import DataLoader
from tpu_unet.data.mvtec import MVTecDataset, get_available_categories
from tpu_unet.data.gear import GearDataset, rasterize_labelme
from tpu_unet.data.kolektorsdd import KolektorSDDDataset

__all__ = [
    "DataLoader",
    "MVTecDataset",
    "get_available_categories",
    "GearDataset",
    "rasterize_labelme",
    "KolektorSDDDataset",
]
