# Workflow entry points (capability parity with the reference's two Makefiles)
DATASET    ?= DataBaker
DATA_ROOT  ?= $(HOME)/Data
DATA_DIR   ?= $(DATA_ROOT)/$(DATASET).tts_processed
ACOUSTIC_RUN ?= runs/acoustic
VOCODER_RUN  ?= runs/vocoder
NUM_DEVICES  ?= 0
MODEL_PARALLEL ?= 1
MESH_FLAGS = --num_devices $(NUM_DEVICES) --model_parallel $(MODEL_PARALLEL)

.PHONY: test test-smoke preprocess train-acoustic train-vocoder finetune-vocoder server stat bench clean

test:
	python -m pytest tests/ -x -q

# fast per-commit tier (<5 min): text/config/parallel/serving smoke subset
test-smoke:
	python -m pytest tests/ -x -q -m smoke

preprocess:
	python -m transtacos_retunegan_tpu.data.preprocess \
		--base_dir $(DATA_ROOT) --dataset databaker --out_dir $(DATASET).tts_processed

train-acoustic:
	python -m transtacos_retunegan_tpu.train.train_acoustic \
		--data_dir $(DATA_DIR) --log_path $(ACOUSTIC_RUN) $(MESH_FLAGS)

train-vocoder:
	python -m transtacos_retunegan_tpu.train.train_vocoder \
		--data_dir $(DATA_DIR) --log_path $(VOCODER_RUN) $(MESH_FLAGS)

finetune-vocoder:
	python -m transtacos_retunegan_tpu.train.train_vocoder \
		--data_dir $(DATA_DIR) --log_path $(VOCODER_RUN) --finetune $(MESH_FLAGS)

server:
	python -m transtacos_retunegan_tpu.serve.app \
		--acoustic_dir $(ACOUSTIC_RUN) --vocoder_dir $(VOCODER_RUN)

test-server:
	curl -s "http://127.0.0.1:5103/synth?text=ni3%20hao3" -o /tmp/test_synth.wav \
		&& file /tmp/test_synth.wav

stat:
	python -m transtacos_retunegan_tpu.tools.corpus_stats --data_dir $(DATA_DIR)

# production recipe: bs64 + HBM-resident corpus + R1-stabilized GAN
# (evidence: docs/convergence_r5/, docs/train_scaling.json)
train-acoustic-prod:
	python -m transtacos_retunegan_tpu.train.train_acoustic \
		--data_dir $(DATA_DIR) --log_path $(ACOUSTIC_RUN) \
		--config prod --device_data

finetune-vocoder-prod:
	python -m transtacos_retunegan_tpu.train.train_vocoder \
		--data_dir $(DATA_DIR) --log_path $(VOCODER_RUN) \
		--config prod --finetune

serving-latency:
	python -m transtacos_retunegan_tpu.tools.serving_latency --duration 60

bench:
	python bench.py

clean:
	rm -rf runs/ __pycache__ .pytest_cache
