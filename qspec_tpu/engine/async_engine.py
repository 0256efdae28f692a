"""AsyncLLMEngine: asyncio front end over LLMEngine.

TPU-native analogue of the reference AsyncLLMEngine
(vllm/engine/async_llm_engine.py:42): a background loop drives
`LLMEngine.step` in a thread executor (device calls block), per-request
asyncio queues stream incremental RequestOutputs, and engine death is
surfaced to all waiters (the reference's AsyncEngineDeadError model,
async_llm_engine.py:666-678).
"""

from __future__ import annotations

import asyncio
from typing import AsyncIterator, Dict, List, Optional

from qspec_tpu.engine.llm_engine import LLMEngine, RequestOutput
from qspec_tpu.sampling_params import SamplingParams


class AsyncEngineDeadError(RuntimeError):
    pass


class AsyncLLMEngine:
    def __init__(self, engine: LLMEngine):
        self.engine = engine
        self._queues: Dict[int, asyncio.Queue] = {}
        self._task: Optional[asyncio.Task] = None
        self._wake = asyncio.Event()
        self._dead: Optional[BaseException] = None

    # ------------------------------------------------------------------
    def _ensure_loop(self):
        if self._task is None or self._task.done():
            self._task = asyncio.get_running_loop().create_task(self._run())

    async def _run(self):
        loop = asyncio.get_running_loop()
        try:
            while True:
                if not self.engine.has_unfinished_requests():
                    self._wake.clear()
                    await self._wake.wait()
                outputs: List[RequestOutput] = await loop.run_in_executor(
                    None, self.engine.step)
                for out in outputs:
                    q = self._queues.get(out.request_id)
                    if q is not None:
                        q.put_nowait(out)
                        if out.finished:
                            self._queues.pop(out.request_id, None)
        except BaseException as e:  # engine dead: fail all waiters
            self._dead = e
            for q in self._queues.values():
                q.put_nowait(e)
            self._queues.clear()
            raise

    # ------------------------------------------------------------------
    async def generate(self, prompt_token_ids: List[int],
                       sampling_params: SamplingParams,
                       request_id: Optional[int] = None,
                       task: str = "generate", prompt_embeds=None,
                       mm_images=None, image_token_id=None,
                       lora_name=None,
                       mm_audio=None) -> AsyncIterator[RequestOutput]:
        if self._dead is not None:
            raise AsyncEngineDeadError("engine loop died") from self._dead
        self._ensure_loop()
        rid = self.engine.add_request(prompt_token_ids, sampling_params,
                                      request_id=request_id, task=task,
                                      prompt_embeds=prompt_embeds,
                                      mm_images=mm_images,
                                      image_token_id=image_token_id,
                                      lora_name=lora_name,
                                      mm_audio=mm_audio)
        q: asyncio.Queue = asyncio.Queue()
        self._queues[rid] = q
        self._wake.set()
        while True:
            item = await q.get()
            if isinstance(item, BaseException):
                raise AsyncEngineDeadError("engine loop died") from item
            yield item
            if item.finished:
                return

    async def abort(self, request_id: int):
        self.engine.abort_request(request_id)
        self._queues.pop(request_id, None)

    def is_running(self) -> bool:
        return self._dead is None
