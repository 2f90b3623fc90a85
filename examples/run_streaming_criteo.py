"""Out-of-core Criteo training via the native streaming reader.

The reference loads the whole dataset into a pandas frame and
LabelEncodes it in memory (examples/run_classification_criteo.py:21-46)
— impossible at full-Criteo scale (~45M rows).  Here the file streams
through the native C++ parser (feature-hashed categoricals, log1p dense)
in fixed-size chunks, so host memory stays at ~one chunk regardless of
dataset size:

    fit(x=criteo_stream(path, columns), batch_size=4096, ...)

Works unchanged on the vendored 200-row sample and on a full-size
day_*.gz dump (decompressed, tab-separated, headerless).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from deepctr_tpu import criteo_columns, criteo_stream, set_compute_dtype
from deepctr_tpu.models import DeepFM

if __name__ == "__main__":
    path = (sys.argv[1] if len(sys.argv) > 1 else
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "data", "criteo_sample.txt"))
    # full-Criteo-scale hashing space; the 1M-row default engages the
    # packed big-table storage + active-rows sparse updates automatically
    vocab = int(os.environ.get("CRITEO_VOCAB", 100_000))
    set_compute_dtype("bfloat16")
    columns = criteo_columns(vocab_size=vocab, embedding_dim=16)

    model = DeepFM(columns, columns, dnn_hidden_units=(400, 400, 400),
                   task="binary")
    model.compile("adagrad", "binary_crossentropy", metrics=["logloss"])

    history = model.fit(criteo_stream(path, columns, chunk_rows=262144),
                        batch_size=int(os.environ.get("BATCH", 256)),
                        epochs=2, verbose=1)
    print({k: [round(float(v), 5) for v in vals]
           for k, vals in history.history.items()})
