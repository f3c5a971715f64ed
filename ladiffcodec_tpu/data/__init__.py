from .audio_io import read_wav, write_wav, resample, convert_audio
from .librispeech import DatasetLibri, BatchLoader
from .chunks import EnCodecData
