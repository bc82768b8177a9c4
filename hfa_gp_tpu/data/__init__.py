from .dataset import (HeadData, HeadDataTest, HeadData3DMM,  # noqa: F401
                      HeadDataAudio, BatchIterator, infinite_batches,
                      process_sharded, EpochSeededBatches)
