# Windows launcher (reference parity: start_windows.ps1 +
# artifacts/start_windows.ps1 — env-profile selection, data-dir pinning,
# port override, health probe).  The reference launcher also bootstraps a
# local Elasticsearch server; here the keyword channel is builtin
# (core/keyword_index.py), so no JVM bootstrap exists — set
# KEYWORD_BACKEND=elasticsearch yourself if you run a real cluster.
#
# Usage:
#   powershell -ExecutionPolicy Bypass -File scripts\start_windows.ps1 `
#       [-Profile offline|online|country] [-EnvFile path\to\.env] [-Port 10001]
#
# Note: the device compute path targets TPU via JAX; on a Windows
# workstation JAX falls back to CPU — every kernel has an interpreter-mode
# CPU path, so the app stays fully functional for small corpora.

param(
    [string]$Profile = "offline",
    [string]$EnvFile = "",
    [int]$Port = 0
)

$ErrorActionPreference = "Stop"
$repoRoot = Split-Path -Parent (Split-Path -Parent $PSCommandPath)
Set-Location $repoRoot

# ---- env profile -----------------------------------------------------
if (-not $EnvFile) {
    $EnvFile = ".env.$Profile.example"
}
if (Test-Path $EnvFile) {
    Write-Host "[start] loading env profile: $EnvFile"
    foreach ($line in Get-Content $EnvFile) {
        $trimmed = $line.Trim()
        if (-not $trimmed -or $trimmed.StartsWith("#")) { continue }
        $eq = $trimmed.IndexOf("=")
        if ($eq -lt 1) { continue }
        $key = $trimmed.Substring(0, $eq).Trim()
        $value = $trimmed.Substring($eq + 1).Trim()
        $hash = $value.IndexOf(" #")
        if ($hash -ge 0) { $value = $value.Substring(0, $hash).Trim() }
        $value = $value.Trim('"').Trim("'")
        # variables already present in the environment win over the profile
        if (-not (Test-Path "Env:$key")) {
            Set-Item -Path "Env:$key" -Value $value
        }
    }
}

if (-not $env:PHOTO_DIR) {
    throw "PHOTO_DIR must be set (directory of photos to index)"
}

# ---- data dir pinning (reference artifacts launcher behavior) ---------
if (-not $env:DATA_DIR) { $env:DATA_DIR = Join-Path $repoRoot "data" }
New-Item -ItemType Directory -Force -Path $env:DATA_DIR | Out-Null
if ($Port -gt 0) { $env:SERVER_PORT = "$Port" }
$serverPort = if ($env:SERVER_PORT) { [int]$env:SERVER_PORT } else { 10001 }

# ---- port-busy check (reference: Test-PortBusy) -----------------------
$busy = Get-NetTCPConnection -LocalPort $serverPort -State Listen `
    -ErrorAction SilentlyContinue
if ($busy) {
    throw ("port $serverPort is already in use (pid " +
           "$($busy[0].OwningProcess)); stop it or pass -Port")
}

# ---- python selection --------------------------------------------------
$python = $null
$venvPython = Join-Path $repoRoot ".venv\Scripts\python.exe"
if (Test-Path $venvPython) {
    $python = $venvPython
} else {
    $candidate = Get-Command python -ErrorAction SilentlyContinue
    if ($candidate) { $python = $candidate.Source }
}
if (-not $python) {
    throw "no python found: create .venv or put python on PATH"
}

& $python -c "import photo_search_engine_tpu" 2>$null
if ($LASTEXITCODE -ne 0) {
    Write-Host "[start] installing package requirements into the venv"
    & $python -m pip install -q jax flax optax numpy pillow
}

Write-Host "[start] launching photo_search_engine_tpu (profile=$Profile)"
$proc = Start-Process -FilePath $python `
    -ArgumentList @("-m", "photo_search_engine_tpu.api.app") `
    -NoNewWindow -PassThru

# ---- health probe (reference: Wait-For* readiness loops) ---------------
$ready = $false
foreach ($i in 1..60) {
    if ($proc.HasExited) { break }
    try {
        $resp = Invoke-WebRequest -UseBasicParsing -TimeoutSec 2 `
            -Uri "http://127.0.0.1:$serverPort/index_status"
        if ($resp.StatusCode -eq 200) { $ready = $true; break }
    } catch { Start-Sleep -Seconds 1 }
}
if ($proc.HasExited) {
    throw "server exited during startup (code $($proc.ExitCode))"
}
if ($ready) {
    Write-Host "[start] ready: http://127.0.0.1:$serverPort"
} else {
    Write-Host "[start] WARNING: /index_status not ready after 60s; leaving server up"
}
Wait-Process -Id $proc.Id
exit $proc.ExitCode
