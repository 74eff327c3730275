// Demo frontend logic (parity analogue of app/frontend_simplified/index.js:
// multipart POST to /generate?mode=, render 4 captions + uploaded image).
(function () {
  const el = (id) => document.getElementById(id);
  const setStatus = (text, cls) => {
    const s = el("status");
    s.textContent = text;
    s.className = cls || "";
  };

  el("go").addEventListener("click", async () => {
    const file = el("file").files[0];
    if (!file) {
      setStatus("pick an image first", "error");
      return;
    }
    const mode = document.querySelector('input[name="mode"]:checked').value;
    const form = new FormData();
    form.append("file", file, file.name);
    setStatus("generating…", "busy");
    try {
      const resp = await fetch(`/generate?mode=${mode}`, {
        method: "POST",
        body: form,
      });
      if (!resp.ok) throw new Error(await resp.text());
      const data = await resp.json();
      for (const key of ["nic", "nic_att", "stylenet", "stylenet_att"]) {
        el(key).textContent = data[key] || "-";
      }
      if (data.path_img && data.path_img !== "-") {
        el("preview").src = data.path_img;
      }
      setStatus("done", "done");
    } catch (err) {
      setStatus(`error: ${err.message}`, "error");
    }
  });
})();
