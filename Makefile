# Workflow entry points (capability parity with the reference's two Makefiles)
DATASET    ?= DataBaker
DATA_ROOT  ?= $(HOME)/Data
DATA_DIR   ?= $(DATA_ROOT)/$(DATASET).tts_processed
ACOUSTIC_RUN ?= runs/acoustic
VOCODER_RUN  ?= runs/vocoder

.PHONY: test preprocess train-acoustic train-vocoder finetune-vocoder server stat bench clean

test:
	python -m pytest tests/ -x -q

preprocess:
	python -m transtacos_retunegan_tpu.data.preprocess \
		--base_dir $(DATA_ROOT) --dataset databaker --out_dir $(DATASET).tts_processed

train-acoustic:
	python -m transtacos_retunegan_tpu.train.train_acoustic \
		--data_dir $(DATA_DIR) --log_path $(ACOUSTIC_RUN)

train-vocoder:
	python -m transtacos_retunegan_tpu.train.train_vocoder \
		--data_dir $(DATA_DIR) --log_path $(VOCODER_RUN)

finetune-vocoder:
	python -m transtacos_retunegan_tpu.train.train_vocoder \
		--data_dir $(DATA_DIR) --log_path $(VOCODER_RUN) --finetune

server:
	python -m transtacos_retunegan_tpu.serve.app \
		--acoustic_dir $(ACOUSTIC_RUN) --vocoder_dir $(VOCODER_RUN)

test-server:
	curl -s "http://127.0.0.1:5103/synth?text=ni3%20hao3" -o /tmp/test_synth.wav \
		&& file /tmp/test_synth.wav

stat:
	python -m transtacos_retunegan_tpu.tools.corpus_stats --data_dir $(DATA_DIR)

bench:
	python bench.py

clean:
	rm -rf runs/ __pycache__ .pytest_cache
