# TPU-native retrieval framework serving image.
# Run on a TPU VM with the matching libtpu; for CPU-only smoke runs set
# FRAG_PLATFORM=cpu.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY financial_rag_tpu/ financial_rag_tpu/
COPY scripts/ scripts/
COPY bench.py pyproject.toml ./

# build the native tokenizer/BM25 library
RUN make -C financial_rag_tpu/native

ENV API_HOST=0.0.0.0 API_PORT=5000
EXPOSE 5000
CMD ["python", "scripts/serve.py", "--auto-ingest"]
