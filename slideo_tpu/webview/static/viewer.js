// Viewer logic: equivalent of the reference webview's Model + MainView +
// pdf.js overlay (webview/src/model/index.ts, components/MainView.tsx,
// viewer/index.ts): fetch /pdf-matchings/{hash}, render every page with a
// play button showing the matched duration, and on click set the video to
// /files/{videoHash}, seek to offsetMs and play (MainView.tsx:53-62).
"use strict";

const params = new URLSearchParams(location.search);
const pdfHash = params.get("pdf-hash");
const serverUrl = params.get("server-url") || "";

const pagesEl = document.getElementById("pages");
const videoEl = document.getElementById("video");
const statusEl = document.getElementById("status");
const rateEl = document.getElementById("rate");

let currentVideoHash = null;

rateEl.addEventListener("change", () => {
  videoEl.playbackRate = parseFloat(rateEl.value);
});

function fmtDuration(ms) {
  const s = Math.round(ms / 1000);
  return `${String(Math.floor(s / 60)).padStart(2, "0")}:${String(s % 60).padStart(2, "0")}`;
}

function playVideo(offsetMs, videoHash) {
  if (currentVideoHash !== videoHash) {
    videoEl.src = `${serverUrl}/files/${videoHash}`;
    currentVideoHash = videoHash;
  }
  videoEl.currentTime = offsetMs / 1000;
  videoEl.playbackRate = parseFloat(rateEl.value);
  videoEl.play();
}

async function init() {
  if (!pdfHash) {
    statusEl.textContent = "No ?pdf-hash= given.";
    return;
  }
  statusEl.textContent = "Loading…";
  let [pagesRes, matchRes] = await Promise.all([
    fetch(`${serverUrl}/pdf-pages/${pdfHash}`),
    fetch(`${serverUrl}/pdf-matchings/${pdfHash}`),
  ]);
  // 202 = the server is extracting the deck's pages in the background
  // (drag&dropped, never-synced PDF) — poll until it finishes.
  while (pagesRes.status === 202) {
    statusEl.textContent = "Extracting pdf pages…";
    await new Promise((r) => setTimeout(r, 1000));
    pagesRes = await fetch(`${serverUrl}/pdf-pages/${pdfHash}`);
  }
  if (!pagesRes.ok) {
    statusEl.textContent =
      pagesRes.status === 404
        ? "Unknown pdf — sync it once with the slideo CLI first."
        : `Could not load pdf pages (${pagesRes.status}).`;
    return;
  }
  const pages = await pagesRes.json();
  const matchings = matchRes.ok ? await matchRes.json() : [];

  // First matching per page (viewer/index.ts:40-76 uses the first one).
  const byPage = new Map();
  for (const m of matchings) {
    if (!byPage.has(m.page_idx)) byPage.set(m.page_idx, []);
    byPage.get(m.page_idx).push(m);
  }
  for (const list of byPage.values()) {
    list.sort((a, b) => a.video_offset_ms - b.video_offset_ms);
  }

  for (const p of pages) {
    const div = document.createElement("div");
    div.className = "page";
    const img = document.createElement("img");
    img.loading = "lazy";
    img.src = `${serverUrl}${p.url}`;
    div.appendChild(img);
    const badge = document.createElement("div");
    badge.className = "badge";
    const ms = byPage.get(p.page_idx);
    if (ms && ms.length) {
      for (const m of ms.slice(0, 3)) {
        const btn = document.createElement("button");
        btn.className = "play-btn";
        btn.textContent = `▶ ${fmtDuration(m.video_offset_ms)} (${fmtDuration(m.duration_ms)})`;
        btn.title = "Play video from this slide";
        btn.addEventListener("click", () => playVideo(m.video_offset_ms, m.video_hash));
        badge.appendChild(btn);
      }
    } else {
      div.classList.add("no-match");
    }
    div.appendChild(badge);
    pagesEl.appendChild(div);
  }
  statusEl.textContent = `${pages.length} pages, ${matchings.length} matchings.`;
}

// Drag & drop a PDF to switch decks: hash the file client-side and reload
// with its content hash (reference: MainView.tsx:36-45 using js-sha256;
// WebCrypto here).
document.body.addEventListener("dragover", (e) => e.preventDefault());
document.body.addEventListener("drop", async (e) => {
  e.preventDefault();
  const file = e.dataTransfer && e.dataTransfer.files && e.dataTransfer.files[0];
  if (!file) return;
  statusEl.textContent = `Hashing ${file.name}…`;
  const buf = await file.arrayBuffer();
  const digest = await crypto.subtle.digest("SHA-256", buf);
  const hex = [...new Uint8Array(digest)].map((b) => b.toString(16).padStart(2, "0")).join("");
  const p = new URLSearchParams(location.search);
  p.set("pdf-hash", hex);
  location.search = p.toString();
});

init();
