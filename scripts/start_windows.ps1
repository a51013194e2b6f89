# Windows launcher (reference parity: start_windows.ps1 +
# artifacts/start_windows.ps1 — env-profile selection, data-dir pinning,
# port override, health probe).  The builtin keyword channel
# (core/keyword_index.py) needs no JVM; when KEYWORD_BACKEND=elasticsearch
# and the configured host is local, a managed Elasticsearch is
# bootstrapped exactly like the reference artifacts launcher (reference
# artifacts/start_windows.ps1:307-470: resolve ELASTICSEARCH_BAT_PATH /
# ELASTICSEARCH_HOME or download+extract, write a managed config, start
# elasticsearch.bat, wait for readiness, record the managed pid for
# stale-process reuse/stop).
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

# ---- managed Elasticsearch bootstrap (KEYWORD_BACKEND=elasticsearch) ----
# Reference parity: artifacts/start_windows.ps1 Ensure-ManagedElasticsearchHome
# (download/extract), Write-ManagedElasticsearchConfig, Start-ManagedElasticsearch
# (readiness wait + stale-managed stop), Write-StackStatus (managed pid record).
$esStatusFile = Join-Path $env:DATA_DIR "managed_es_status.json"

function Test-EsReady([string]$EsHost, [int]$EsPort) {
    try {
        $resp = Invoke-WebRequest -UseBasicParsing -TimeoutSec 5 `
            -Uri "http://${EsHost}:$EsPort/"
        return ($resp.StatusCode -ge 200 -and $resp.StatusCode -lt 300)
    } catch { return $false }
}

function Stop-StaleManagedEs([string]$StatusPath, [int]$EsPort) {
    # only ever stops a pid THIS launcher recorded as managed; a foreign
    # process on the port is an error, not a kill target
    if (-not (Test-Path $StatusPath)) { return }
    try { $status = Get-Content $StatusPath -Raw | ConvertFrom-Json } catch { return }
    if (-not $status.managed -or -not $status.pid) { return }
    $proc = Get-Process -Id $status.pid -ErrorAction SilentlyContinue
    if ($proc) {
        Write-Host "[start] stopping stale managed Elasticsearch (pid $($status.pid))"
        # the recorded pid is the cmd.exe wrapper from Start-Process
        # cmd /c elasticsearch.bat — on Windows children outlive their
        # parent, so a plain Stop-Process leaves the java process
        # holding the port; /T kills the whole tree
        & taskkill.exe /PID $status.pid /T /F 2>$null | Out-Null
        Start-Sleep -Seconds 3
    }
    $stillBusy = Get-NetTCPConnection -LocalPort $EsPort -State Listen `
        -ErrorAction SilentlyContinue
    if ($stillBusy) {
        # the port is still held (e.g. an orphaned JVM the tree kill
        # could not reach) — keep the status file so the managed pid is
        # not lost for a retry, and let the caller's busy-port check
        # surface the error
        Write-Host "[start] port $EsPort still busy after stopping pid $($status.pid)"
        return
    }
    Remove-Item $StatusPath -Force -ErrorAction SilentlyContinue
}

function Ensure-EsHome([string]$Version, [string]$EsRoot) {
    # explicit installs win over the managed download
    if ($env:ELASTICSEARCH_BAT_PATH) {
        if (-not (Test-Path $env:ELASTICSEARCH_BAT_PATH)) {
            throw "ELASTICSEARCH_BAT_PATH does not exist: $env:ELASTICSEARCH_BAT_PATH"
        }
        return Split-Path -Parent (Split-Path -Parent $env:ELASTICSEARCH_BAT_PATH)
    }
    if ($env:ELASTICSEARCH_HOME) {
        $bat = Join-Path $env:ELASTICSEARCH_HOME "bin\elasticsearch.bat"
        if (-not (Test-Path $bat)) {
            throw "ELASTICSEARCH_HOME is missing bin\elasticsearch.bat: $env:ELASTICSEARCH_HOME"
        }
        return $env:ELASTICSEARCH_HOME
    }
    $esHome = Join-Path $EsRoot "elasticsearch-$Version"
    $bat = Join-Path $esHome "bin\elasticsearch.bat"
    if (Test-Path $bat) { return $esHome }
    New-Item -ItemType Directory -Force -Path $EsRoot | Out-Null
    $zipName = "elasticsearch-$Version-windows-x86_64.zip"
    $zipPath = Join-Path $EsRoot $zipName
    if (-not (Test-Path $zipPath)) {
        Write-Host "[start] downloading Elasticsearch $Version"
        Invoke-WebRequest -UseBasicParsing -OutFile $zipPath `
            -Uri "https://artifacts.elastic.co/downloads/elasticsearch/$zipName"
    }
    Write-Host "[start] extracting Elasticsearch $Version"
    Expand-Archive -Path $zipPath -DestinationPath $EsRoot -Force
    if (-not (Test-Path $bat)) {
        throw "Elasticsearch archive extracted but $bat not found"
    }
    return $esHome
}

if ($env:KEYWORD_BACKEND -eq "elasticsearch") {
    $esHost = if ($env:ELASTICSEARCH_HOST) { $env:ELASTICSEARCH_HOST } else { "localhost" }
    $esPort = if ($env:ELASTICSEARCH_PORT) { [int]$env:ELASTICSEARCH_PORT } else { 9200 }
    $isLocal = $esHost -in @("localhost", "127.0.0.1", "::1", "::", "0.0.0.0")
    # probe URL: 0.0.0.0/:: are listen-everywhere bind addresses you cannot
    # connect TO, and bare IPv6 literals need brackets in a URI
    $esProbeHost = switch ($esHost) {
        "0.0.0.0" { "127.0.0.1" }
        "::"      { "[::1]" }
        "::1"     { "[::1]" }
        default   { $esHost }
    }
    if (-not $isLocal) {
        Write-Host "[start] KEYWORD_BACKEND=elasticsearch with remote host ${esHost}:$esPort — not managing it"
    } elseif (Test-EsReady $esProbeHost $esPort) {
        Write-Host "[start] Elasticsearch already reachable at http://${esProbeHost}:$esPort"
    } else {
        $esBusy = Get-NetTCPConnection -LocalPort $esPort -State Listen `
            -ErrorAction SilentlyContinue
        if ($esBusy) { Stop-StaleManagedEs $esStatusFile $esPort }
        $esBusy = Get-NetTCPConnection -LocalPort $esPort -State Listen `
            -ErrorAction SilentlyContinue
        if ($esBusy) {
            throw ("port $esPort is busy but Elasticsearch is not responding; " +
                   "stop the process or change ELASTICSEARCH_PORT")
        }
        $esVersion = if ($env:ELASTICSEARCH_VERSION) { $env:ELASTICSEARCH_VERSION } else { "8.14.3" }
        $esRoot = Join-Path $env:DATA_DIR "elasticsearch"
        $esHome = Ensure-EsHome $esVersion $esRoot
        $esConfigDir = Join-Path $esRoot "config"
        $esDataDir = Join-Path $esRoot "data"
        $esLogsDir = Join-Path $esRoot "logs"
        foreach ($d in @($esConfigDir, $esDataDir, $esLogsDir)) {
            New-Item -ItemType Directory -Force -Path $d | Out-Null
        }
        # single-node dev config, security off — matches the reference's
        # managed config (artifacts/start_windows.ps1:274-305)
        @"
cluster.name: photo-search-managed
node.name: photo-search-node
discovery.type: single-node
network.host: $esHost
http.port: $esPort
xpack.security.enabled: false
xpack.security.http.ssl.enabled: false
path.data: '$esDataDir'
path.logs: '$esLogsDir'
"@ | Set-Content -Path (Join-Path $esConfigDir "elasticsearch.yml") -Encoding UTF8

        $env:ES_PATH_CONF = $esConfigDir
        if (-not $env:ES_JAVA_OPTS) { $env:ES_JAVA_OPTS = "-Xms1g -Xmx1g" }
        Write-Host "[start] starting managed Elasticsearch $esVersion at http://${esHost}:$esPort"
        $esProc = Start-Process -FilePath "cmd.exe" `
            -ArgumentList @("/c", "`"$esHome\bin\elasticsearch.bat`"") `
            -WorkingDirectory $esHome -PassThru -WindowStyle Hidden
        $esReady = $false
        foreach ($i in 1..120) {
            if ($esProc.HasExited) { break }
            if (Test-EsReady $esProbeHost $esPort) { $esReady = $true; break }
            Start-Sleep -Seconds 1
        }
        if (-not $esReady) {
            throw "managed Elasticsearch failed to become ready within 120s (see $esLogsDir)"
        }
        @{ managed = $true; pid = $esProc.Id; version = $esVersion;
           url = "http://${esHost}:$esPort" } |
            ConvertTo-Json | Set-Content -Path $esStatusFile -Encoding UTF8
        Write-Host "[start] Elasticsearch ready (managed pid $($esProc.Id))"
    }
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
