"""Client for the OpenAI-compatible ChatTS server.

Reference parity with demo/vllm_api.py:45-55: message content parts carry
``{"timeseries": [...]}`` next to text parts; server at :12345, model name
"chatts".  stdlib-only (no openai package needed).
"""
import argparse
import json
import urllib.request

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base-url", default="http://localhost:12345/v1")
    parser.add_argument("--stream", action="store_true")
    args = parser.parse_args()

    timeseries = (np.sin(np.arange(256) / 10) * 5.0)
    timeseries[100:] -= 10.0

    body = {
        "model": "chatts",
        "messages": [
            {
                "role": "user",
                "content": [
                    {"type": "text", "text": "I have a time series: "},
                    {"timeseries": timeseries.tolist()},
                    {"type": "text",
                     "text": ". Please analyze the local changes."},
                ],
            }
        ],
        "max_tokens": 256,
        "temperature": 0.2,
        "stream": args.stream,
    }
    req = urllib.request.Request(
        f"{args.base_url}/chat/completions",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        if args.stream:
            for raw in resp:
                line = raw.decode().strip()
                if not line.startswith("data: "):
                    continue
                payload = line[len("data: "):]
                if payload == "[DONE]":
                    break
                chunk = json.loads(payload)
                delta = chunk["choices"][0].get("delta", {}).get("content", "")
                print(delta, end="", flush=True)
            print()
        else:
            data = json.loads(resp.read())
            print(data["choices"][0]["message"]["content"])
            print("usage:", data["usage"])


if __name__ == "__main__":
    main()
